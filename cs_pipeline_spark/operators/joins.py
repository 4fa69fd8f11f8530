"""joins operators (stub, populated in later milestones)."""
