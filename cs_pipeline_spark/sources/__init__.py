"""Scan helpers (populated in later milestones)."""
