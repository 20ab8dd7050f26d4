"""Transmitter chain composite.

Mirrors the production Tx entry point transmitter_cc (resource mapper ->
modulator -> per-shift cyclic prefixer + preamble insertion,
/root/reference/lib/transmitter_cc_impl.cc:130-195) plus the
short_burst_shaper's zero padding and complex scaling
(/root/reference/lib/short_burst_shaper_impl.cc:161-182).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..config import GfdmConfig
from ..ops import tx as tx_ops

__all__ = ["transmit_bursts", "shape_bursts"]

DEFAULT_DTYPE = jnp.complex64


def transmit_bursts(cfg: GfdmConfig, data, dtype=DEFAULT_DTYPE):
    """(..., n_data) payload symbols -> (..., n_shifts, frame_len) bursts."""
    return tx_ops.transmit(cfg, data, dtype=dtype)


@lru_cache(maxsize=16)
def _shape_fn(cfg: GfdmConfig, pre: int, post: int, dtype):
    @jax.jit
    def fn(bursts, scale):
        shape = bursts.shape
        zpre = jnp.zeros(shape[:-1] + (pre,), dtype=bursts.dtype)
        zpost = jnp.zeros(shape[:-1] + (post,), dtype=bursts.dtype)
        return jnp.concatenate([zpre, bursts * scale, zpost], axis=-1)

    return fn


def shape_bursts(cfg: GfdmConfig, bursts, scale=1.0, pre: int | None = None,
                 post: int | None = None, dtype=DEFAULT_DTYPE):
    """Zero-pad bursts to the padded frame length and apply a complex scale.

    Defaults reproduce the canonical padding that rounds the frame to a
    power of two (configurator.py:22-33).
    """
    if pre is None:
        pre = cfg.pre_padding_len
    if post is None:
        post = cfg.post_padding_len
    bursts = jnp.asarray(bursts, dtype=dtype)
    return _shape_fn(cfg, int(pre), int(post), dtype)(
        bursts, jnp.asarray(scale, dtype=dtype)
    )
