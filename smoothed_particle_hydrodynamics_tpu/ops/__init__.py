"""Compute ops: smoothing kernels, grid binning, neighbor search, physics,
integration, step orchestration, and the Pallas fused kernels."""
