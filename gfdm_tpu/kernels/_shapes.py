"""Tiling/shape tables for the Pallas kernels (reserved)."""
