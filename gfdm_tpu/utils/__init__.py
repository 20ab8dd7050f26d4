"""Utility helpers (IQ format conversion, misc)."""
from .converter import cf64_to_sc16, sc16_to_cf64  # noqa: F401
