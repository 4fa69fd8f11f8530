"""reshape operators (stub, populated in later milestones)."""
