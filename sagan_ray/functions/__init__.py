"""Vectorized per-batch kernels (pure functions, no Ray)."""
