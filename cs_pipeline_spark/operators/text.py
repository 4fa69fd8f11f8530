"""text operators (stub, populated in later milestones)."""
