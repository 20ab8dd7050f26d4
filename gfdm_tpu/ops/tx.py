"""Batched transmitter ops (JAX/XLA path).

The unit of work is a batch of bursts: shape (..., n_data_symbols) in,
(..., n_shifts, frame_len) out. Everything is one dense matmul (MXU) plus
cheap gathers/elementwise work; the preamble is a trace-time constant.

Reference call stack being replaced: transmitter_cc_impl::general_work ->
transmitter_kernel::modulate/add_frame
(/root/reference/lib/transmitter_cc_impl.cc:130-195,
/root/reference/lib/transmitter_kernel.cc:78-107).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from . import operators
from ._validate import check_last_dim

__all__ = ["modulate", "map_resources", "add_cyclic_prefix", "transmit", "transmit_core"]

DEFAULT_DTYPE = jnp.complex64


@lru_cache(maxsize=16)
def _modulate_fn(cfg: GfdmConfig, dtype):
    A_T = operators.modulation_operator(cfg).T.astype(np.dtype(dtype))

    @jax.jit
    def fn(grid_flat):
        return grid_flat @ A_T

    return fn


def modulate(cfg: GfdmConfig, grid_flat, dtype=DEFAULT_DTYPE):
    """(..., M*K) subcarrier-major grid symbols -> (..., M*K) time samples."""
    grid_flat = jnp.asarray(grid_flat, dtype=dtype)
    check_last_dim(grid_flat, cfg.block_len, "modulate", "timeslots*subcarriers")
    return _modulate_fn(cfg, dtype)(grid_flat)


@lru_cache(maxsize=16)
def _map_fn(cfg: GfdmConfig, dtype):
    # scatter as a gather of (data ++ [0]) with a precomputed index vector
    n_data = cfg.n_data_symbols
    idx = np.full(cfg.block_len, n_data, dtype=np.int32)  # default -> zero slot
    Amap = operators.mapping_matrix(cfg)
    rows, cols = np.nonzero(Amap.real)
    idx[rows] = cols

    @jax.jit
    def fn(data):
        padded = jnp.concatenate(
            [data, jnp.zeros(data.shape[:-1] + (1,), dtype=data.dtype)], axis=-1
        )
        return jnp.take(padded, jnp.asarray(idx), axis=-1)

    return fn


def map_resources(cfg: GfdmConfig, data, dtype=DEFAULT_DTYPE):
    """(..., n_data) -> (..., M*K) flat subcarrier-major resource grid."""
    data = jnp.asarray(data, dtype=dtype)
    check_last_dim(data, cfg.n_data_symbols, "map_resources",
                   "timeslots*active_subcarriers")
    return _map_fn(cfg, dtype)(data)


def demap_indices(cfg: GfdmConfig) -> np.ndarray:
    """Frame positions of the data symbols (inverse of map_resources)."""
    Amap = operators.mapping_matrix(cfg)
    rows, cols = np.nonzero(Amap.real)
    out = np.empty(cfg.n_data_symbols, dtype=np.int32)
    out[cols] = rows
    return out


@lru_cache(maxsize=16)
def _cp_fn(cfg: GfdmConfig, cyclic_shift: int, dtype):
    idx = operators.cp_indices(cfg, cyclic_shift)
    win = operators.cp_window(cfg).astype(np.dtype(dtype))

    @jax.jit
    def fn(core):
        return jnp.take(core, jnp.asarray(idx), axis=-1) * win

    return fn


def add_cyclic_prefix(cfg: GfdmConfig, core, cyclic_shift: int = 0, dtype=DEFAULT_DTYPE):
    """(..., M*K) -> (..., window_len): CP/CS + cyclic shift + RC window."""
    return _cp_fn(cfg, cyclic_shift, dtype)(jnp.asarray(core, dtype=dtype))


@lru_cache(maxsize=16)
def _transmit_fns(cfg: GfdmConfig, dtype):
    T_T = operators.tx_core_operator(cfg).T.astype(np.dtype(dtype))
    cp_idx = np.stack(
        [operators.cp_indices(cfg, s) for s in cfg.cyclic_shifts]
    )  # (n_shifts, window_len)
    win = operators.cp_window(cfg).astype(np.dtype(dtype))
    preambles = cfg.full_preambles.astype(np.dtype(dtype))  # (n_shifts, p_len)

    @jax.jit
    def core_fn(data):
        return data @ T_T

    @jax.jit
    def frame_fn(data):
        core = data @ T_T  # (..., N)
        framed = jnp.take(core, jnp.asarray(cp_idx), axis=-1) * win  # (..., n_shifts, W)
        pre = jnp.broadcast_to(jnp.asarray(preambles), framed.shape[:-2] + preambles.shape)
        return jnp.concatenate([pre, framed], axis=-1)

    return core_fn, frame_fn


def transmit_core(cfg: GfdmConfig, data, dtype=DEFAULT_DTYPE):
    """(..., n_data) -> (..., M*K): map + modulate (no CP, no preamble)."""
    return _transmit_fns(cfg, dtype)[0](jnp.asarray(data, dtype=dtype))


def transmit(cfg: GfdmConfig, data, dtype=DEFAULT_DTYPE):
    """Full multi-antenna Tx: (..., n_data) -> (..., n_shifts, frame_len).

    Modulates once, then emits one cyclically-shifted, CP-framed, windowed,
    preamble-prefixed burst per configured cyclic shift (cyclic delay
    diversity, transmitter_cc_impl.cc:165-177).
    """
    data = jnp.asarray(data, dtype=dtype)
    check_last_dim(data, cfg.n_data_symbols, "transmit",
                   "timeslots*active_subcarriers")
    return _transmit_fns(cfg, dtype)[1](data)
