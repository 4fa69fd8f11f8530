"""windows operators (stub, populated in later milestones)."""
