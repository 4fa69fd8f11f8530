"""multimodal operators (stub, populated in later milestones)."""
