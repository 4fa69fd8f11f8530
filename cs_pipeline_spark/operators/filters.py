"""filters operators (stub, populated in later milestones)."""
