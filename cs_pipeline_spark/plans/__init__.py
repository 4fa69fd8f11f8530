"""Driver-side planning."""
