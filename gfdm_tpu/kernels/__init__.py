"""Pallas TPU kernels for the hot fused paths."""
from .fused import rx_core_fused, rx_full_fused, rx_ic_fused, tx_frame_fused  # noqa: F401
