"""spatial operators (stub, populated in later milestones)."""
