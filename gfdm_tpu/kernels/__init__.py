"""Pallas TPU kernels for the hot fused paths."""
from .fused import (  # noqa: F401
    default_link_block,
    link_single_fused,
    rx_core_fused,
    rx_full_fused,
    rx_ic_fused,
    rx_receiver_fused,
    tx_frame_fused,
)
