"""Fused Pallas detection front end: the whole sync trace chain in VMEM.

The round-4 matmul front end (ops/planar_pipeline._detect_front_planar,
impl="matmul") made every sliding window a polyphase banded block matmul but
still round-trips ~8 intermediate traces through HBM between stages. This
kernel keeps a block of chunks' pair rows in VMEM and runs the full chain -
preamble cross-correlation, autocorrelation product, K/2K window sums, the
CP-integration, and the gated metric - in one pass; only the five epilogue
traces (gated, ac planes, energy, ic) are written back. The argmax/CFO/
median epilogue stays in XLA (cheap reductions).

Layout: one chunk's samples are pre-blocked by XLA into ``nb`` overlapping
pair rows [re(s[ub:(u+2)b]) | im(...)] of width 4b (b = 2K = xcorr kernel
length). Forward windows (xcorr, K/2K sums) read only the valid prefix of
each pair row; the backward CP-integration pairs each aligned row with its
predecessor (zeroed across chunk boundaries - the reference's zero pre-pad,
ops/sync.py ic padding).

Sync algorithm provenance: Schmidl&Cox autocorrelation + CP integration +
gated cross-correlation per the reference's
/root/reference/python/pygfdm/synchronization.py:246-263.
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

__all__ = ["detect_front_pallas"]


@lru_cache(maxsize=16)
def _consts(cfg: GfdmConfig):
    from ..ops.planar import real_operator

    K = cfg.subcarriers
    b = 2 * K  # block = pair half-width = xcorr kernel length
    p = np.conjugate(cfg.core_preamble)
    p = p / np.sqrt(np.mean(np.abs(p) ** 2))
    Kc = np.zeros((2 * b, b), dtype=np.complex128)
    for v in range(b):
        Kc[v : v + b, v] = p
    xcorr = real_operator(Kc, np.float32)  # (4b, 2b) -> [re | im]

    def band(w: int, backward: bool = False) -> np.ndarray:
        Bm = np.zeros((2 * b, b), dtype=np.float32)
        for v in range(b):
            if backward:
                Bm[b + v - w + 1 : b + v + 1, v] = 1.0
            else:
                Bm[v : v + w, v] = 1.0
        return Bm

    cp1 = cfg.cp_len + 1
    return {
        "xcorr": xcorr,
        "bandK": band(K),
        "band2K": band(2 * K),
        "bandCP": band(cp1, backward=True) / cp1,
        "b": b,
    }


def _kernel(cfg: GfdmConfig, nb: int, c_chunks: int,
            pairs_ref, xc_ref, bk_ref, b2k_ref, bcp_ref, mask_ref,
            gated_ref, acr_ref, aci_ref, en_ref, ic_ref):
    K = cfg.subcarriers
    b = 2 * K
    p = pairs_ref[:]  # (C*nb, 4b)
    s_re, s_im = p[:, : 2 * b], p[:, 2 * b :]

    # --- xcorr: one banded complex matmul per pair row -------------------
    cc = jnp.dot(p, xc_ref[:], preferred_element_type=jnp.float32)
    ccm = (cc[:, :b] ** 2 + cc[:, b:] ** 2) / np.float32(b * b)

    # --- autocorrelation product conj(s[t]) * s[t+K] ----------------------
    # lane roll by K; wrapped tail >= 2b-K is invalid but the K-wide band
    # only reads positions < b + K
    br = jnp.concatenate([s_re[:, K:], s_re[:, :K]], axis=1)
    bi = jnp.concatenate([s_im[:, K:], s_im[:, :K]], axis=1)
    cpr = s_re * br + s_im * bi
    cpi = s_re * bi - s_im * br
    pr = jnp.dot(cpr, bk_ref[:], preferred_element_type=jnp.float32)
    pi = jnp.dot(cpi, bk_ref[:], preferred_element_type=jnp.float32)

    # --- energy over 2K ---------------------------------------------------
    e = jnp.dot(s_re * s_re + s_im * s_im, b2k_ref[:],
                preferred_element_type=jnp.float32)
    e = jnp.maximum(e, 1e-30)

    # --- normalized autocorrelation + magnitude ---------------------------
    g = 2.0 / e
    acr = pr * g
    aci = pi * g
    ac_mag = jnp.sqrt(acr * acr + aci * aci)

    # --- CP integration: backward window, predecessor-row pairing ---------
    zero_row = jnp.zeros((1, b), jnp.float32)
    prev = jnp.concatenate([zero_row, ac_mag[:-1, :]], axis=0)
    prev = prev * mask_ref[:]  # zero across chunk boundaries (ref zero-pad)
    ic = jnp.dot(jnp.concatenate([prev, ac_mag], axis=1), bcp_ref[:],
                 preferred_element_type=jnp.float32)

    gated_ref[:] = jnp.sqrt(ccm) * ic
    acr_ref[:] = acr
    aci_ref[:] = aci
    en_ref[:] = e
    ic_ref[:] = ic


@lru_cache(maxsize=16)
def _call(cfg: GfdmConfig, batch: int, nb: int, c_chunks: int, interpret: bool):
    b = 2 * cfg.subcarriers
    rows = batch * nb
    block = c_chunks * nb
    kernel = functools.partial(_kernel, cfg, nb, c_chunks)
    out = lambda: jax.ShapeDtypeStruct((rows, b), jnp.float32)
    spec = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(out(), out(), out(), out(), out()),
        grid=(rows // block,),
        in_specs=[
            spec(4 * b),
            const(4 * b, 2 * b),  # xcorr
            const(2 * b, b),      # bandK
            const(2 * b, b),      # band2K
            const(2 * b, b),      # bandCP (backward)
            spec(1),              # boundary mask column (C*nb, 1)
        ],
        out_specs=(spec(b), spec(b), spec(b), spec(b), spec(b)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# v2: trace-lean kernel - only the gated metric and CP-integration traces
# leave VMEM; peak-local values (CFO, scale) are recomputed outside from a
# 2K-sample window around the argmax (a few hundred FLOP per chunk).
# ---------------------------------------------------------------------------
@lru_cache(maxsize=16)
def _consts2(cfg: GfdmConfig):
    c = _consts(cfg)
    b = c["b"]
    # kernel rows are [re_u | im_u | re_{u+1} | im_{u+1}]; permute the
    # xcorr operator's rows from the [re(2b) | im(2b)] convention
    perm = np.concatenate([
        np.arange(0, b), np.arange(2 * b, 3 * b),
        np.arange(b, 2 * b), np.arange(3 * b, 4 * b),
    ])
    return {**c, "xcorr2": np.ascontiguousarray(c["xcorr"][perm])}


def _kernel2(cfg: GfdmConfig,
             rows_ref, xc_ref, bk_ref, b2k_ref, bcp_ref, mask_ref,
             gated_ref, ic_ref):
    K = cfg.subcarriers
    b = 2 * K
    x = rows_ref[:]  # (blk, 2b): [re_u | im_u] aligned rows
    blk = x.shape[0]
    # pair each row with its successor (the next aligned block; a chunk's
    # final pad row is zero, giving the reference's zero tail)
    zero = jnp.zeros((1, 2 * b), jnp.float32)
    nxt = jnp.concatenate([x[1:, :], zero], axis=0)
    p = jnp.concatenate([x, nxt], axis=1)  # (blk, 4b)

    cc = jnp.dot(p, xc_ref[:], preferred_element_type=jnp.float32)
    ccm = (cc[:, :b] ** 2 + cc[:, b:] ** 2) / np.float32(b * b)

    s_re = jnp.concatenate([p[:, :b], p[:, 2 * b : 3 * b]], axis=1)
    s_im = jnp.concatenate([p[:, b : 2 * b], p[:, 3 * b :]], axis=1)
    br = jnp.concatenate([s_re[:, K:], s_re[:, :K]], axis=1)
    bi = jnp.concatenate([s_im[:, K:], s_im[:, :K]], axis=1)
    cpr = s_re * br + s_im * bi
    cpi = s_re * bi - s_im * br
    pr = jnp.dot(cpr, bk_ref[:], preferred_element_type=jnp.float32)
    pi = jnp.dot(cpi, bk_ref[:], preferred_element_type=jnp.float32)
    e = jnp.dot(s_re * s_re + s_im * s_im, b2k_ref[:],
                preferred_element_type=jnp.float32)
    e = jnp.maximum(e, 1e-30)
    g = 2.0 / e
    ac_mag = jnp.sqrt(pr * pr + pi * pi) * g

    zero_b = jnp.zeros((1, b), jnp.float32)
    prev = jnp.concatenate([zero_b, ac_mag[:-1, :]], axis=0) * mask_ref[:]
    ic = jnp.dot(jnp.concatenate([prev, ac_mag], axis=1), bcp_ref[:],
                 preferred_element_type=jnp.float32)

    gated_ref[:] = jnp.sqrt(ccm) * ic
    ic_ref[:] = ic


@lru_cache(maxsize=16)
def _call2(cfg: GfdmConfig, rows: int, block: int, interpret: bool):
    b = 2 * cfg.subcarriers
    kernel = functools.partial(_kernel2, cfg)
    spec = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = lambda: jax.ShapeDtypeStruct((rows, b), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(out(), out()),
        grid=(rows // block,),
        in_specs=[
            spec(2 * b),
            const(4 * b, 2 * b),
            const(2 * b, b),
            const(2 * b, b),
            const(2 * b, b),
            spec(1),
        ],
        out_specs=(spec(b), spec(b)),
        interpret=interpret,
    )


def detect_bursts_pallas(cfg: GfdmConfig, s, search_limit: int,
                         c_chunks: int = 32, interpret: bool | None = None,
                         floor_stride: int = 8):
    """Trace-lean fused detection: (..., 2, T) -> detection dict.

    Same contract as ops.planar_pipeline.detect_bursts_planar (minus the
    ac_metric debug trace): start/cfo/scale/strength/ac_peak/noise_floor.
    Only two trace arrays leave the kernel; CFO and scale come from one
    2K-sample window gather at the detected peak.
    """
    if interpret is None:
        from .fused import _on_tpu

        interpret = not _on_tpu()
    c = _consts2(cfg)
    b = c["b"]
    K = cfg.subcarriers
    T = s.shape[-1]
    lead = s.shape[:-2]
    n_ac = T - 2 * K
    flat = s.reshape((-1, 2, T))
    B = flat.shape[0]

    nbp = -(-T // b) + 1  # aligned blocks + one zero pad block
    pad = nbp * b - T
    xp = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    rows = jnp.moveaxis(xp.reshape(B, 2, nbp, b), 1, 2).reshape(B * nbp, 2 * b)

    n_rows = B * nbp
    blk = nbp
    for cc_ in range(min(c_chunks, B), 0, -1):
        if B % cc_ == 0:
            blk = cc_ * nbp
            break
    mask = np.ones((n_rows, 1), np.float32)
    mask[0::nbp] = 0.0  # no CP history across chunk starts (zero pre-pad)

    call = _call2(cfg, n_rows, blk, bool(interpret))
    gated_r, ic_r = call(
        rows,
        jnp.asarray(c["xcorr2"]),
        jnp.asarray(c["bandK"]),
        jnp.asarray(c["band2K"]),
        jnp.asarray(c["bandCP"]),
        jnp.asarray(mask),
    )
    n_valid = min(n_ac, int(search_limit))
    gated = gated_r.reshape(B, nbp * b)[:, :n_valid]
    ic_t = ic_r.reshape(B, nbp * b)

    nc = jnp.argmax(gated, axis=-1)
    strength = jnp.take_along_axis(gated, nc[:, None], axis=-1)[:, 0]
    ac_peak = jnp.take_along_axis(ic_t, nc[:, None], axis=-1)[:, 0]
    floor = jnp.median(ic_t[:, :n_valid:floor_stride], axis=-1)

    # peak-local window: samples [nc, nc + 2K) give both the K-lag
    # autocorrelation (CFO angle) and the 2K energy (scale)
    idx = nc[:, None] + jnp.arange(2 * K)[None, :]
    win = jnp.take_along_axis(flat, idx[:, None, :], axis=-1)  # (B, 2, 2K)
    wr, wi = win[:, 0, :], win[:, 1, :]
    a_re, a_im = wr[:, :K], wi[:, :K]
    b_re, b_im = wr[:, K:], wi[:, K:]
    p_r = jnp.sum(a_re * b_re + a_im * b_im, axis=-1)
    p_i = jnp.sum(a_re * b_im - a_im * b_re, axis=-1)
    cfo = jnp.arctan2(p_i, p_r) / (2.0 * jnp.pi)
    energy = jnp.maximum(jnp.sum(wr * wr + wi * wi, axis=-1), 1e-30)
    scale = jnp.sqrt((2.0 * K) / energy)

    def un(v):
        return v.reshape(lead)

    return {
        "start": un(nc), "cfo": un(cfo), "scale": un(scale),
        "strength": un(strength), "ac_peak": un(ac_peak),
        "noise_floor": un(floor),
    }


def detect_front_pallas(cfg: GfdmConfig, s, search_limit: int,
                        c_chunks: int = 32, interpret: bool | None = None):
    """Fused front end: (..., 2, T) planar chunks -> (gated, ac, energy, ic)
    with the exact contract of ops.planar_pipeline._detect_front_planar.
    """
    if interpret is None:
        from .fused import _on_tpu

        interpret = not _on_tpu()
    c = _consts(cfg)
    b = c["b"]
    K = cfg.subcarriers
    T = s.shape[-1]
    lead = s.shape[:-2]
    n_ac = T - 2 * K
    flat = s.reshape((-1, 2, T))
    B = flat.shape[0]
    c_chunks = max(1, min(c_chunks, B))
    while B % c_chunks:
        c_chunks -= 1

    # pair rows (XLA): pad to (nb+1) blocks, rows u = blocks (u, u+1)
    nb = -(-T // b)
    pad = (nb + 1) * b - T
    xp = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    xb = xp.reshape(B, 2, nb + 1, b)
    pairs = jnp.concatenate([xb[:, :, :-1, :], xb[:, :, 1:, :]], axis=-1)
    # rows: [re | im] per pair -> (B*nb, 4b)
    rows = jnp.concatenate([pairs[:, 0], pairs[:, 1]], axis=-1)
    rows = rows.reshape(B * nb, 4 * b)

    mask = np.ones((B * nb, 1), np.float32)
    mask[0 :: nb] = 0.0  # predecessor row of each chunk's first row is void

    call = _call(cfg, B, nb, int(c_chunks), bool(interpret))
    gated, acr, aci, en, ic = call(
        rows,
        jnp.asarray(c["xcorr"]),
        jnp.asarray(c["bandK"]),
        jnp.asarray(c["band2K"]),
        jnp.asarray(c["bandCP"]),
        jnp.asarray(mask),
    )

    def un(x, n):
        return x.reshape(lead + (nb * b,))[..., :n]

    n_valid = min(n_ac, int(search_limit))
    ac = jnp.stack([un(acr, n_ac), un(aci, n_ac)], axis=-2)
    return (un(gated, n_valid), ac, un(en, n_ac), un(ic, n_ac))
