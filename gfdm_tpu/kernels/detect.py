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
