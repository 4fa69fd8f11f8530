"""dedup operators (stub, populated in later milestones)."""
