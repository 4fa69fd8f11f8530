"""aggregate operators (stub, populated in later milestones)."""
