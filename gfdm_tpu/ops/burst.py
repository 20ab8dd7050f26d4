"""Burst extraction: fixed-length windows cut from a stream at detected
positions, with power normalization and CFO derotation.

Static-shape reformulation of the tag-driven extract_burst_cc block
(/root/reference/lib/extract_burst_cc_impl.cc:117-241): GR's dynamic tag
offsets become index arrays from the detector; the pre-roll ("tag_backoff")
zero-fill behavior at stream start is reproduced with gather fill values.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..config import GfdmConfig

__all__ = ["extract_bursts", "remove_prefix"]

DEFAULT_DTYPE = jnp.complex64


@lru_cache(maxsize=16)
def _extract_fn(cfg: GfdmConfig, burst_len: int, backoff: int, correct_cfo: bool, dtype):
    K = cfg.subcarriers

    @jax.jit
    def fn(stream, start, scale, cfo):
        # gather window [start - backoff, start - backoff + burst_len)
        offs = jnp.arange(burst_len)
        idx = start[..., None] + offs - backoff  # (..., burst_len)
        burst = jnp.take_along_axis(
            jnp.asarray(stream, dtype=dtype),
            jnp.clip(idx, 0, stream.shape[-1] - 1),
            axis=-1,
        )
        # zero-fill out-of-range positions (stream start/end), like the
        # reference's prepend-zero handling (extract_burst_cc_impl.cc:184-191)
        valid = (idx >= 0) & (idx < stream.shape[-1])
        burst = jnp.where(valid, burst, 0.0)
        burst = burst * scale[..., None].astype(burst.real.dtype)
        if correct_cfo:
            # derotate e^{-j 2 pi cfo n / K} from the window start
            n = offs.astype(burst.real.dtype)
            rot = jnp.exp(-2j * jnp.pi * cfo[..., None].astype(burst.real.dtype) * n / K)
            burst = burst * rot.astype(burst.dtype)
        return burst

    return fn


def extract_bursts(
    cfg: GfdmConfig,
    stream,
    detection,
    burst_len: int | None = None,
    backoff: int | None = None,
    correct_cfo: bool = True,
    dtype=DEFAULT_DTYPE,
):
    """Cut one burst per stream chunk using detector metadata.

    ``detection`` is the dict from gfdm_tpu.ops.sync.detect_bursts (start
    points at the core preamble). With the default backoff == cp_len the
    returned burst is aligned at the start of the full windowed preamble and
    spans the whole frame (preamble + CP + payload + CS).
    """
    if burst_len is None:
        burst_len = cfg.frame_len
    if backoff is None:
        backoff = cfg.cp_len
    fn = _extract_fn(cfg, int(burst_len), int(backoff), bool(correct_cfo), dtype)
    return fn(stream, detection["start"], detection["scale"], detection["cfo"])


@partial(jax.jit, static_argnums=(1, 2))
def remove_prefix(frames, offset: int, length: int):
    """(..., T) -> (..., length): tag-driven frame slice analogue.

    Mirror of remove_prefix_cc (/root/reference/lib/remove_prefix_cc_impl.cc:84-115):
    copy ``length`` samples starting at ``offset`` within each tagged frame.
    """
    return jax.lax.slice_in_dim(frames, offset, offset + length, axis=-1)
