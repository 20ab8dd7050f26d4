"""Channel coding: rate-1/2 constraint-length-7 convolutional code + Viterbi.

The consumer of the soft-output demapper (ops.softbits): LLRs in, decoded
info bits out - proving the coded-link path end to end. The reference's OTA
demo frames payloads with a CRC32 but carries no FEC
(/root/reference/examples/gfdm_ota_demo.grc); this takes the chain one step
further so the mmse/LLR receiver capabilities have a measurable payoff
(coding gain, see examples/coded_link.py).

TPU-native decoder design: the Viterbi add-compare-select recursion is a
``lax.scan`` over time carrying the 64 path metrics as one vector lane
(vectorized over the trellis AND the burst batch - thousands of bursts
decode in a single program), followed by a reverse scan traceback through
the stored per-state decisions. No Python loops over states or time.

Code: industry-standard polynomials (133, 171) octal, K=7, zero-terminated
(6 tail bits). Tap convention: bit j of the generator taps input x[t-j]
(LSB = current input); generator reversal preserves the distance spectrum
(free distance 10).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CONV_RATE",
    "CONV_TAIL_BITS",
    "conv_encode",
    "viterbi_decode",
    "interleaver",
    "coded_bits_per_block",
    "info_bits_for_block",
]

_G = (0o133, 0o171)  # generator polynomials, LSB taps the current input
_K = 7
_NSTATES = 1 << (_K - 1)  # 64
CONV_RATE = 0.5
CONV_TAIL_BITS = _K - 1


def _parity(x: np.ndarray) -> np.ndarray:
    p = np.zeros_like(x)
    for _ in range(_K):
        p ^= x & 1
        x >>= 1
    return p


@lru_cache(maxsize=1)
def _trellis():
    """Predecessor/output tables indexed by NEXT state.

    state s = last 6 input bits, newest at LSB; consuming b:
    ns = ((s << 1) | b) & 63, so ns's LSB is the decoded bit and its two
    predecessors are (ns >> 1) and (ns >> 1) | 32.
    """
    ns = np.arange(_NSTATES)
    b = ns & 1
    prev = np.stack([ns >> 1, (ns >> 1) | (_NSTATES >> 1)], axis=1)  # (64, 2)
    w = (prev << 1) | b[:, None]  # 7-bit window for each transition
    outs = np.stack([_parity(w & g) for g in _G], axis=-1)  # (64, 2, 2)
    return prev.astype(np.int32), outs.astype(np.float32), b.astype(np.int32)


def conv_encode(bits: np.ndarray) -> np.ndarray:
    """(..., n) info bits {0,1} -> (..., 2*(n+6)) coded bits, interleaved
    c0[0] c1[0] c0[1] c1[1] ...; zero-terminated (the decoder assumes it)."""
    bits = np.asarray(bits, dtype=np.uint8)
    n = bits.shape[-1]
    x = np.concatenate(
        [
            np.zeros(bits.shape[:-1] + (_K - 1,), np.uint8),
            bits,
            np.zeros(bits.shape[:-1] + (_K - 1,), np.uint8),
        ],
        axis=-1,
    )
    T = n + CONV_TAIL_BITS
    out = np.zeros(bits.shape[:-1] + (T, 2), np.uint8)
    for ci, g in enumerate(_G):
        c = np.zeros(bits.shape[:-1] + (T,), np.uint8)
        for j in range(_K):
            if (g >> j) & 1:
                # tap x[t-j]; x is left-padded by K-1 zeros
                c ^= x[..., _K - 1 - j : _K - 1 - j + T]
        out[..., ci] = c
    return out.reshape(bits.shape[:-1] + (2 * T,))


@lru_cache(maxsize=8)
def _viterbi_fn(n_info: int):
    prev, outs, _ = _trellis()
    # branch metric sign: LLR > 0 favors bit 0 (ops.softbits convention),
    # so a transition emitting c contributes (1 - 2c) * llr / 2; the 1/2 is
    # a common scale and is dropped (max-log decisions are scale-invariant)
    sgn = 1.0 - 2.0 * outs  # (64, 2 preds, 2 coded bits)
    T = n_info + CONV_TAIL_BITS
    neg = np.float32(-1e30)

    @jax.jit
    def fn(llrs):
        # llrs: (..., 2T) pairs (c0, c1) per trellis step
        lead = llrs.shape[:-1]
        # f32 path metrics regardless of caller dtype (x64 test mode feeds
        # f64 LLRs); max-log decisions are scale/precision insensitive
        lp = llrs.astype(jnp.float32).reshape(lead + (T, 2))
        pm0 = jnp.full(lead + (_NSTATES,), neg).at[..., 0].set(0.0)
        pv = jnp.asarray(prev)  # (64, 2)
        sg = jnp.asarray(sgn)

        def step(pm, l_t):
            # l_t: (..., 2) -> branch metrics (..., 64, 2)
            bm = sg[..., 0] * l_t[..., None, None, 0] + (
                sg[..., 1] * l_t[..., None, None, 1]
            )
            cand = pm[..., pv] + bm  # (..., 64, 2)
            dec = jnp.argmax(cand, axis=-1)
            return jnp.max(cand, axis=-1), dec.astype(jnp.int8)

        # scan over time: move T to the front
        lt = jnp.moveaxis(lp, -2, 0)
        pm, decs = jax.lax.scan(step, pm0, lt)  # decs: (T, ..., 64)

        # traceback from the zero state (zero-terminated encoder)
        def back(state, dec_t):
            # dec_t: (..., 64); current state's winning predecessor
            d = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
            bit = state & 1
            nxt = jnp.take_along_axis(
                jnp.asarray(prev)[state], d[..., None], axis=-1
            )[..., 0]
            return nxt, bit

        state0 = jnp.zeros(lead, jnp.int32)
        _, bits_rev = jax.lax.scan(back, state0, decs[::-1])
        bits = jnp.moveaxis(bits_rev[::-1], 0, -1)  # (..., T)
        return bits[..., :n_info].astype(jnp.uint8)

    return fn


def viterbi_decode(llrs, n_info: int):
    """Soft-decision Viterbi: (..., 2*(n_info+6)) LLRs -> (..., n_info) bits.

    LLR convention: positive favors bit 0 (ops.softbits). The sequence must
    be zero-terminated (conv_encode appends the 6 tail bits).
    """
    return _viterbi_fn(int(n_info))(jnp.asarray(llrs))


def interleaver(n: int, seed: int = 0x1EAF) -> np.ndarray:
    """Fixed pseudo-random interleaver permutation of length n.

    Spreads a faded subcarrier's burst errors across the codeword so the
    Viterbi decoder sees near-independent errors (use with
    channel='multipath'; pure AWGN gains nothing). Apply as
    coded[..., perm]; invert with np.argsort(perm)."""
    return np.random.default_rng(seed).permutation(n)


def coded_bits_per_block(n_info: int) -> int:
    """Codeword length for ``n_info`` info bits (rate 1/2 + 6 tail bits)."""
    return 2 * (n_info + CONV_TAIL_BITS)


def info_bits_for_block(n_coded: int) -> int:
    """Largest info-bit count whose codeword fits in ``n_coded`` bits."""
    return n_coded // 2 - CONV_TAIL_BITS
