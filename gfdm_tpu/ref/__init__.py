"""Golden reference model: pure NumPy/float64 GFDM implementations.

This subpackage is the framework's ground truth, mirroring the role of the
reference's ``pygfdm`` package (/root/reference/python/pygfdm). Every TPU op
in :mod:`gfdm_tpu.ops` is tested element-wise against these functions.
"""
from . import (  # noqa: F401
    channel_estimation,
    correlation,
    cyclic_prefix,
    demodulation,
    filters,
    mapping,
    modulation,
    preamble,
    legacy,
    symbolmapping,
    synchronization,
    utils,
    validation,
    zadoff_chu,
)
