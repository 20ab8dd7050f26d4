"""Pallas TPU kernels: fused hot paths of the planar GFDM pipeline.

The XLA path runs the receiver core as three separate HBM-level ops
(block-FFT matmul -> ZF divide -> fold/demod matmul). These kernels fuse each
chain so the per-burst state never leaves VMEM between stages; the realified
operator matrices stay VMEM-resident across the whole burst batch (grid over
burst blocks, operators unblocked).

Layouts match gfdm_tpu.ops.planar: a complex vector of length n is the real
vector [re | im] of length 2n; complex matmuls use the realified
[[Wr, Wi], [-Wi, Wr]] operators.

Both kernels are validated element-wise against the XLA planar pipeline
(tests/test_pallas.py, interpret mode on CPU; native Mosaic on TPU).
"""
from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GfdmConfig
from ..ops.planar_pipeline import _np_mats, _small_consts

__all__ = ["rx_core_fused", "tx_frame_fused"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# fused receiver core: block FFT -> ZF divide -> fold/demod, one VMEM pass
# ---------------------------------------------------------------------------
def _rx_core_kernel(n: int, frame_ref, chan_ref, fw_ref, bfd_ref, out_ref):
    x = frame_ref[:]  # (Bb, 2N)
    X = jnp.dot(x, fw_ref[:], preferred_element_type=jnp.float32)
    Xr, Xi = X[:, :n], X[:, n:]
    C = chan_ref[:]
    Cr, Ci = C[:, :n], C[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Yr = (Xr * Cr + Xi * Ci) / den
    Yi = (Xi * Cr - Xr * Ci) / den
    Y = jnp.concatenate([Yr, Yi], axis=-1)
    out_ref[:] = jnp.dot(Y, bfd_ref[:], preferred_element_type=jnp.float32)


@lru_cache(maxsize=16)
def _rx_core_call(cfg: GfdmConfig, batch: int, block: int, interpret: bool):
    n = cfg.block_len
    n2 = 2 * n
    kernel = functools.partial(_rx_core_kernel, n)
    grid = (batch // block,)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def rx_core_fused(cfg: GfdmConfig, frames, channel, block: int = 64,
                  interpret: bool | None = None):
    """Fused ZF receiver core.

    frames, channel: (B, 2, N) planar -> (B, 2, N) planar symbol estimates.
    Equivalent to pmatmul(pdiv(pmatmul(frames, F_W), channel), Bfd_W).
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _np_mats(cfg, "float32")
    n = cfg.block_len
    B = frames.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _rx_core_call(cfg, B, block, bool(interpret))
    out = call(
        frames.reshape(B, 2 * n),
        channel.reshape(B, 2 * n),
        jnp.asarray(mats["F_W"]),
        jnp.asarray(mats["Bfd_W"]),
    )
    return out.reshape(B, 2, n)


# ---------------------------------------------------------------------------
# fused transmitter: map+modulate matmul -> CP gather -> window -> preamble
# ---------------------------------------------------------------------------
def _tx_kernel(n: int, w_len: int, p_len: int,
               data_ref, tw_ref, idx_ref, win_ref, pre_ref, out_ref):
    d = data_ref[:]  # (Bb, 2*n_data)
    core = jnp.dot(d, tw_ref[:], preferred_element_type=jnp.float32)  # (Bb, 2N)
    core_r, core_i = core[:, :n], core[:, n:]
    idx = idx_ref[:]  # (1, w_len) int32
    framed_r = jnp.take(core_r, idx[0], axis=-1) * win_ref[:]
    framed_i = jnp.take(core_i, idx[0], axis=-1) * win_ref[:]
    bb = d.shape[0]
    pre = pre_ref[:]  # (2, p_len)
    out_ref[:, :p_len] = jnp.broadcast_to(pre[0], (bb, p_len))
    out_ref[:, p_len : p_len + w_len] = framed_r
    L = p_len + w_len
    out_ref[:, L : L + p_len] = jnp.broadcast_to(pre[1], (bb, p_len))
    out_ref[:, L + p_len :] = framed_i


@lru_cache(maxsize=16)
def _tx_call(cfg: GfdmConfig, batch: int, block: int, interpret: bool):
    n = cfg.block_len
    n_d2 = 2 * cfg.n_data_symbols
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    f2 = 2 * cfg.frame_len
    kernel = functools.partial(_tx_kernel, n, w_len, p_len)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, f2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, n_d2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_d2, 2 * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def tx_frame_fused(cfg: GfdmConfig, data, block: int = 128,
                   interpret: bool | None = None):
    """Fused Tx chain for the first cyclic shift.

    data: (B, 2, n_data) planar payload -> (B, 2, frame_len) planar burst.
    Equivalent to transmit_planar(cfg, data)[:, 0].
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _np_mats(cfg, "float32")
    c = _small_consts(cfg, "float32")
    B = data.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _tx_call(cfg, B, block, bool(interpret))
    out = call(
        data.reshape(B, -1),
        jnp.asarray(mats["T_W"]),
        jnp.asarray(c["cp_idx"][0][None, :].astype(np.int32)),
        jnp.asarray(c["win"][None, :]),
        jnp.asarray(c["preambles"][0]),
    )
    return out.reshape(B, 2, cfg.frame_len)
