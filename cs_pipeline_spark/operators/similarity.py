"""similarity operators (stub, populated in later milestones)."""
