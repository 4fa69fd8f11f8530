"""Batch twins of streaming windows (stub)."""
