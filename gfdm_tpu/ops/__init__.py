"""Batched, jit-compiled GFDM ops: the TPU equivalents of the reference's
C++ kernel layer (/root/reference/lib, SURVEY.md section 2.1)."""
from . import estimation, operators, rx, tx  # noqa: F401
