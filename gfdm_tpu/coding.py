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

# windowed-decoder defaults: span = body + 2*overlap trellis steps per
# window. overlap 38 > the 5*K=35 truncation depth of the K=7 code;
# body 52 makes span 128 = 16*8, so the forward/backward scans run 8
# unrolled iterations instead of the full decoder's T/G (39 at the
# canonical T=468) - the measured bottleneck is per-scan-step latency,
# not arithmetic (docs/STATUS.md round-4 Viterbi record)
WINDOW_BODY = 52
WINDOW_OVERLAP = 38

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
def _radix_tables(k: int):
    """Collapsed-trellis tables for radix-2^k ACS.

    Composing k trellis steps is exact (max-plus associativity): the state
    after k inputs is ns = ((p << k) | b_0..b_{k-1}) & 63 with the oldest
    new bit at the field's MSB, so ns has 2^k predecessors enumerated by the
    k bits j shifted out of p: p = (ns >> k) | (j << (6-k)). The table holds
    the 2k coded-bit signs each (ns, j) transition emits; the branch metric
    is their dot product with the 2k LLRs of the collapsed step. One scan
    step then advances k trellis steps - k-fold less path-metric traffic
    and k-fold fewer scan iterations at identical decisions (exact ML).
    """
    assert 1 <= k <= _K - 1
    ns = np.arange(_NSTATES)[:, None]
    j = np.arange(1 << k)[None, :]
    p = (ns >> k) | (j << ((_K - 1) - k))
    sgn = np.zeros((_NSTATES, 1 << k, 2 * k), np.float32)
    state = np.broadcast_to(p, (_NSTATES, 1 << k)).copy()
    for i in range(k):
        b = (ns >> (k - 1 - i)) & 1  # chronological: oldest new bit first
        w = (state << 1) | b
        for ci, g in enumerate(_G):
            sgn[..., 2 * i + ci] = 1.0 - 2.0 * _parity(w & g)
        state = w & (_NSTATES - 1)
    return sgn


@lru_cache(maxsize=8)
def _viterbi_fn(n_info: int):
    prev, outs, _ = _trellis()
    # branch metric sign: LLR > 0 favors bit 0 (ops.softbits convention),
    # so a transition emitting c contributes (1 - 2c) * llr / 2; the 1/2 is
    # a common scale and is dropped (max-log decisions are scale-invariant)
    sgn = 1.0 - 2.0 * outs  # (64, 2 preds, 2 coded bits)
    T = n_info + CONV_TAIL_BITS
    neg = np.float32(-1e30)

    half = _NSTATES >> 1
    # unroll G trellis steps per scan iteration: the per-iteration scan
    # overhead dominates the tiny (B, 64) step bodies (measured: the
    # one-step-per-iteration form runs 468 x ~115 us); G is the largest
    # divisor of T up to 16 so no pad steps corrupt the terminated path
    G = max(g for g in range(1, 17) if T % g == 0)

    @jax.jit
    def fn(llrs):
        # llrs: (..., 2T) pairs (c0, c1) per trellis step
        lead = llrs.shape[:-1]
        # f32 path metrics regardless of caller dtype (x64 test mode feeds
        # f64 LLRs); max-log decisions are scale/precision insensitive
        lp = llrs.astype(jnp.float32).reshape(lead + (T, 2))
        pm0 = jnp.full(lead + (_NSTATES,), neg).at[..., 0].set(0.0)
        sg = jnp.asarray(sgn)

        def step(pm, l_t):
            # l_t: (..., 2) -> branch metrics (..., 64, 2). The butterfly
            # structure makes predecessor access gather-free: prev0 of
            # ns = ns>>1 walks 0,0,1,1,... so pm[prev0] is repeat(pm[:32])
            # (and pm[prev1] = repeat(pm[32:])) - pure data layout
            bm = sg[..., 0] * l_t[..., None, None, 0] + (
                sg[..., 1] * l_t[..., None, None, 1]
            )
            c0 = jnp.repeat(pm[..., :half], 2, axis=-1) + bm[..., 0]
            c1 = jnp.repeat(pm[..., half:], 2, axis=-1) + bm[..., 1]
            dec = c1 > c0  # ties pick predecessor 0, as argmax did
            return jnp.maximum(c0, c1), dec

        def fwd_group(pm, lt_g):  # lt_g: (G, ..., 2)
            decs = []
            for j in range(G):
                pm, d = step(pm, lt_g[j])
                decs.append(d)
            return pm, jnp.stack(decs)

        # scan over time groups: move T to the front, fold into (T/G, G)
        lt = jnp.moveaxis(lp, -2, 0)
        ltg = lt.reshape((T // G, G) + lt.shape[1:])
        pm, decs = jax.lax.scan(fwd_group, pm0, ltg)
        decs = decs.reshape((T,) + decs.shape[2:])  # (T, ..., 64) bool

        # traceback from the zero state (zero-terminated encoder); the
        # predecessor index is arithmetic: (state >> 1) | (dec << 5)
        def back(state, dec_t):
            d = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
            bit = state & 1
            nxt = (state >> 1) | (d.astype(state.dtype) << (_K - 2))
            return nxt, bit

        def back_group(state, dec_g):
            bits = []
            for j in range(G):
                state, bb = back(state, dec_g[j])
                bits.append(bb)
            return state, jnp.stack(bits)

        state0 = jnp.zeros(lead, jnp.int32)
        dg = decs[::-1].reshape((T // G, G) + decs.shape[1:])
        _, bits_rev = jax.lax.scan(back_group, state0, dg)
        bits_rev = bits_rev.reshape((T,) + bits_rev.shape[2:])
        bits = jnp.moveaxis(bits_rev[::-1], 0, -1)  # (..., T)
        return bits[..., :n_info].astype(jnp.uint8)

    return fn


@lru_cache(maxsize=8)
def _viterbi_sm_fn(n_info: int):
    """State-major Viterbi: path metrics laid out (64 states, batch).

    TPU vector registers are (8 sublanes, 128 lanes) with the minor-most
    axis on lanes: the batch-major (B, 64) layout leaves half of every
    lane idle (64 < 128) and the traceback needs a per-element gather
    dec[b, state[b]]. Putting states on the MAJOR axis makes every
    butterfly op a major-axis slice over fully-occupied batch lanes, and
    the traceback becomes a dense one-hot contraction (the survivor state
    is carried as a one-hot (64, B) mask, advanced with reshapes and
    sums) - no gather anywhere in the program. Decisions are identical to
    the reference scan (same tie rule); measured ~2x on the chip
    (benchmarks/viterbi_bench.py).
    """
    _, outs, _ = _trellis()
    sgn = 1.0 - 2.0 * outs  # (64, 2 preds, 2 coded bits)
    T = n_info + CONV_TAIL_BITS
    neg = np.float32(-1e30)
    half = _NSTATES >> 1
    G = max(g for g in range(1, 17) if T % g == 0)

    @jax.jit
    def fn(llrs):
        lead = llrs.shape[:-1]
        B = int(np.prod(lead)) if lead else 1
        lp = llrs.astype(jnp.float32).reshape(B, T, 2)
        lt = jnp.moveaxis(lp, 0, -1)  # (T, 2, B)
        pm0 = jnp.full((_NSTATES, B), neg).at[0, :].set(0.0)
        sg0 = jnp.asarray(sgn[..., 0])[..., None]  # (64, 2, 1)
        sg1 = jnp.asarray(sgn[..., 1])[..., None]

        def step(pm, l_t):
            # l_t: (2, B); bm: (64, 2, B); all state-axis ops are major
            bm = sg0 * l_t[0] + sg1 * l_t[1]
            c0 = jnp.repeat(pm[:half], 2, axis=0) + bm[:, 0]
            c1 = jnp.repeat(pm[half:], 2, axis=0) + bm[:, 1]
            dec = c1 > c0
            return jnp.maximum(c0, c1), dec

        def fwd_group(pm, lt_g):
            decs = []
            for j in range(G):
                pm, d = step(pm, lt_g[j])
                decs.append(d)
            return pm, jnp.stack(decs)

        ltg = lt.reshape((T // G, G) + lt.shape[1:])
        _, decs = jax.lax.scan(fwd_group, pm0, ltg)
        decs = decs.reshape((T, _NSTATES, B))

        # traceback with a one-hot survivor mask: oh[s, b] = 1 iff the
        # path at this depth is in state s. d = <dec_t, oh> selects each
        # batch element's decision densely; the predecessor mask for
        # ns = (s >> 1) | (d << 5) is a pair-sum placed in the d-half.
        def back(oh, dec_t):
            d = jnp.sum(jnp.where(dec_t, oh, 0.0), axis=0)  # (B,)
            pairs = oh.reshape(half, 2, -1)
            bit = jnp.sum(pairs[:, 1], axis=0)  # LSB of the current state
            folded = pairs[:, 0] + pairs[:, 1]  # one-hot over s >> 1
            nxt = jnp.concatenate([(1.0 - d) * folded, d * folded], axis=0)
            return nxt, bit

        def back_group(oh, dec_g):
            bits = []
            for j in range(G):
                oh, bb = back(oh, dec_g[j])
                bits.append(bb)
            return oh, jnp.stack(bits)

        oh0 = jnp.zeros((_NSTATES, B)).at[0, :].set(1.0)
        dg = decs[::-1].reshape((T // G, G, _NSTATES, B))
        _, bits_rev = jax.lax.scan(back_group, oh0, dg)
        bits_rev = bits_rev.reshape((T, B))
        bits = jnp.moveaxis(bits_rev[::-1], 0, -1).reshape(lead + (T,))
        return (bits[..., :n_info] > 0.5).astype(jnp.uint8)

    return fn


@lru_cache(maxsize=16)
def _viterbi_radix_fn(n_info: int, k: int):
    """Radix-2^k Viterbi: exact ML decisions, k trellis steps per scan step.

    The measured decoder bottleneck is HBM traffic of the per-step (B, 64)
    tensors, not arithmetic (batch scaling is flat; benchmarks/
    viterbi_bench.py). Collapsing k steps divides both the scan length and
    the per-step tensor count by k at the same total branch arithmetic, so
    throughput scales ~k until the (B, 64, 2^k) branch-metric tensor starts
    to dominate (k=4 measured best at the canonical block).
    """
    sgn = _radix_tables(k)  # (64, 2^k, 2k)
    T = n_info + CONV_TAIL_BITS
    assert T % k == 0, "caller picks k | T"
    S = T // k  # collapsed steps
    neg = np.float32(-1e30)
    G = max(g for g in range(1, 17) if S % g == 0)

    @jax.jit
    def fn(llrs):
        lead = llrs.shape[:-1]
        lp = llrs.astype(jnp.float32).reshape(lead + (S, 2 * k))
        pm0 = jnp.full(lead + (_NSTATES,), neg).at[..., 0].set(0.0)
        sg = jnp.asarray(sgn)

        def step(pm, l_t):
            # branch metrics: one contraction over the 2k collapsed LLRs
            bm = jnp.einsum("...m,sjm->...sj", l_t, sg)
            # predecessor access is a pure reshape/broadcast, gather-free:
            # p = (ns >> k) | (j << (6-k)) depends only on (ns_hi, j), so
            # view pm as [j, hi], transpose to [hi, j], and broadcast over
            # the 2^k low bits of ns
            A = jnp.swapaxes(
                pm.reshape(pm.shape[:-1] + (1 << k, _NSTATES >> k)), -1, -2
            )  # (..., hi, j)
            cand = A[..., :, None, :] + bm.reshape(
                bm.shape[:-2] + (_NSTATES >> k, 1 << k, 1 << k)
            )  # (..., hi, lo, j); ns = (hi << k) | lo
            cand = cand.reshape(bm.shape)
            # two fused reductions - NOT max + take_along_axis: a per-element
            # gather over the 2^k axis lowers to scalar loads on TPU (the
            # same pathology the barrel extractor replaced)
            nxt = jnp.max(cand, axis=-1)
            dec = jnp.argmax(cand, axis=-1).astype(jnp.uint8)
            return nxt, dec

        def fwd_group(pm, lt_g):
            decs = []
            for jj in range(G):
                pm, d = step(pm, lt_g[jj])
                decs.append(d)
            return pm, jnp.stack(decs)

        lt = jnp.moveaxis(lp, -2, 0)
        ltg = lt.reshape((S // G, G) + lt.shape[1:])
        _, decs = jax.lax.scan(fwd_group, pm0, ltg)
        decs = decs.reshape((S,) + decs.shape[2:])  # (S, ..., 64) uint8

        # gather-free traceback: the survivor state is a one-hot (..., 64)
        # mask. Selecting the state's decision and emitting its k bits are
        # dense contractions; the predecessor p = (ns >> k) | (j << (6-k))
        # one-hot is the outer product of onehot(j) with the lo-folded mask
        # (take_along_axis here measured ~40% of the decode, the TPU
        # per-element-gather pathology again)
        bitmask = jnp.asarray(
            np.stack(
                [(np.arange(_NSTATES) >> (k - 1 - i)) & 1 for i in range(k)],
                axis=-1,
            ).astype(np.float32)
        )  # (64, k): chronological bits of each state
        n_hi = _NSTATES >> k

        def back(oh, dec_t):
            j = jnp.sum(jnp.where(oh > 0.5, dec_t, 0), axis=-1)  # (...,)
            bits = jnp.matmul(oh, bitmask)  # (..., k)
            hi = jnp.sum(oh.reshape(oh.shape[:-1] + (n_hi, 1 << k)), axis=-1)
            j_oh = (j[..., None] == jnp.arange(1 << k, dtype=j.dtype)).astype(
                oh.dtype
            )
            nxt = (j_oh[..., :, None] * hi[..., None, :]).reshape(oh.shape)
            return nxt, bits

        def back_group(oh, dec_g):
            bits = []
            for jj in range(G):
                oh, bb = back(oh, dec_g[jj])
                bits.append(bb)
            return oh, jnp.stack(bits)

        oh0 = jnp.zeros(lead + (_NSTATES,), jnp.float32).at[..., 0].set(1.0)
        dg = decs[::-1].reshape((S // G, G) + decs.shape[1:])
        _, bits_rev = jax.lax.scan(back_group, oh0, dg)
        # (S//G, G, ..., k) -> (S, ..., k); reverse steps, keep in-step order
        bits_rev = bits_rev.reshape((S,) + bits_rev.shape[2:])
        bits = jnp.moveaxis(bits_rev[::-1], 0, -2)  # (..., S, k)
        bits = bits.reshape(lead + (T,))
        return (bits[..., :n_info] > 0.5).astype(jnp.uint8)

    return fn


@lru_cache(maxsize=8)
def _viterbi_windowed_fn(n_info: int, body: int, overlap: int):
    """Block-parallel (windowed) Viterbi: decode overlapping windows of the
    trellis concurrently instead of scanning all T steps sequentially.

    Each window covers ``span = body + 2*overlap`` trellis steps; windows are
    folded into the batch axis, so the two scans (ACS forward, traceback
    backward) shrink from T steps to span steps while the per-step tensors
    grow by the window count - the right trade on a backend whose scan cost
    is per-step latency, not per-element arithmetic (measured ~110 us/step
    regardless of batch, docs/STATUS.md). Correctness comes from the
    standard truncation argument: survivor paths merge within ~5*K steps,
    so decisions in a window's body are independent of the uniform metric
    start once ``overlap`` warmup steps precede them. Boundary windows are
    exact: a window starting at step 0 starts pinned at state 0, and a
    window ending at step T tracebacks from the zero-terminated state.
    """
    _, outs, _ = _trellis()
    sgn = 1.0 - 2.0 * outs
    T = n_info + CONV_TAIL_BITS
    span = body + 2 * overlap
    assert T >= span, "caller guards: fall back to the full decoder"
    neg = np.float32(-1e30)
    half = _NSTATES >> 1

    W = -(-T // body)  # windows, bodies tile [0, T)
    starts = np.clip(np.arange(W) * body - overlap, 0, T - span)
    ends = starts + span
    t = np.arange(T)
    w_of_t = np.minimum(t // body, W - 1)
    pos_of_t = t - starts[w_of_t]
    time_idx = starts[:, None] + np.arange(span)[None, :]  # (W, span)
    pinned = starts == 0  # exact state-0 start (trellis origin)
    terminal = ends == T  # exact state-0 end (zero-terminated)
    G = max(g for g in range(1, 17) if span % g == 0)

    @jax.jit
    def fn(llrs):
        lead = llrs.shape[:-1]
        lp = llrs.astype(jnp.float32).reshape(lead + (T, 2))
        wl = lp[..., jnp.asarray(time_idx), :]  # (..., W, span, 2)
        # init metrics: pinned windows concentrate on state 0; interior
        # windows start uniform (any-state) and converge inside the overlap
        pm0 = jnp.where(
            jnp.asarray(pinned)[:, None] & (jnp.arange(_NSTATES) != 0)[None, :],
            neg,
            0.0,
        )
        pm0 = jnp.broadcast_to(pm0, lead + (W, _NSTATES))
        sg = jnp.asarray(sgn)

        def step(pm, l_t):
            bm = sg[..., 0] * l_t[..., None, None, 0] + (
                sg[..., 1] * l_t[..., None, None, 1]
            )
            c0 = jnp.repeat(pm[..., :half], 2, axis=-1) + bm[..., 0]
            c1 = jnp.repeat(pm[..., half:], 2, axis=-1) + bm[..., 1]
            dec = c1 > c0
            return jnp.maximum(c0, c1), dec

        def fwd_group(pm, lt_g):
            decs = []
            for j in range(G):
                pm, d = step(pm, lt_g[j])
                decs.append(d)
            return pm, jnp.stack(decs)

        lt = jnp.moveaxis(wl, -2, 0)  # (span, ..., W, 2)
        ltg = lt.reshape((span // G, G) + lt.shape[1:])
        pm, decs = jax.lax.scan(fwd_group, pm0, ltg)
        decs = decs.reshape((span,) + decs.shape[2:])  # (span, ..., W, 64)

        state0 = jnp.where(
            jnp.asarray(terminal),
            0,
            jnp.argmax(pm, axis=-1).astype(jnp.int32),
        ).astype(jnp.int32)
        state0 = jnp.broadcast_to(state0, lead + (W,))

        def back(state, dec_t):
            d = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
            bit = state & 1
            nxt = (state >> 1) | (d.astype(state.dtype) << (_K - 2))
            return nxt, bit

        def back_group(state, dec_g):
            bits = []
            for j in range(G):
                state, bb = back(state, dec_g[j])
                bits.append(bb)
            return state, jnp.stack(bits)

        dg = decs[::-1].reshape((span // G, G) + decs.shape[1:])
        _, bits_rev = jax.lax.scan(back_group, state0, dg)
        bits_rev = bits_rev.reshape((span,) + bits_rev.shape[2:])
        bits = jnp.moveaxis(bits_rev[::-1], 0, -1)  # (..., W, span)
        # stitch: each output step comes from its owner window's body
        out = bits[..., jnp.asarray(w_of_t), jnp.asarray(pos_of_t)]
        return out[..., :n_info].astype(jnp.uint8)

    return fn


def viterbi_decode(llrs, n_info: int, mode: str = "auto"):
    """Soft-decision Viterbi: (..., 2*(n_info+6)) LLRs -> (..., n_info) bits.

    LLR convention: positive favors bit 0 (ops.softbits). The sequence must
    be zero-terminated (conv_encode appends the 6 tail bits).

    ``mode``:
    - "radix" (= "auto" when a k>1 divides the trellis length): radix-2^k
      collapsed ACS - exact ML decisions in k-fold fewer scan steps with
      k-fold less path-metric HBM traffic. Measured 2.4x over "full" on
      the chip (12.2 ms / 335 kbursts/s at batch 4096, k=4;
      benchmarks/viterbi_bench.py).
    - "full": the batch-major one-step-per-scan-iteration reference scan
      (exact ML); the "auto" fallback when no radix divides T.
    - "sm": state-major layout (64, batch) with a gather-free one-hot
      traceback - exact ML, bit-identical to "full"; measured slower
      (the extra (64, B) traceback arithmetic outweighs the lane win).
    - "windowed": block-parallel truncated decoding (WINDOW_BODY/
      WINDOW_OVERLAP) - scan length 128 regardless of T; parity-tested,
      measured slower (the decoder is bandwidth-, not latency-bound).
    The alternatives are kept as recorded, tested design points.
    """
    n_info = int(n_info)
    T = n_info + CONV_TAIL_BITS
    if mode in ("auto", "radix"):
        k = next((kk for kk in (4, 3, 2) if T % kk == 0), 1)
        if k > 1:
            return _viterbi_radix_fn(n_info, k)(jnp.asarray(llrs))
        if mode == "radix":
            raise ValueError(f"no radix k in (4,3,2) divides T={T}")
        return _viterbi_fn(n_info)(jnp.asarray(llrs))
    if mode == "sm":
        return _viterbi_sm_fn(n_info)(jnp.asarray(llrs))
    if mode == "windowed":
        if T < WINDOW_BODY + 2 * WINDOW_OVERLAP:
            raise ValueError(f"trellis too short for windowed decoding (T={T})")
        return _viterbi_windowed_fn(n_info, WINDOW_BODY, WINDOW_OVERLAP)(
            jnp.asarray(llrs)
        )
    if mode != "full":
        raise ValueError(f"unknown viterbi mode {mode!r}")
    return _viterbi_fn(n_info)(jnp.asarray(llrs))


def interleaver(n: int, seed: int = 0x1EAF) -> np.ndarray:
    """Fixed interleaver permutation of length n.

    Spreads a faded subcarrier's burst errors across the codeword so the
    Viterbi decoder sees near-independent errors (use with
    channel='multipath'; pure AWGN gains nothing). Apply as
    coded[..., perm]; invert with np.argsort(perm).

    Computed arithmetically (golden-ratio coprime stride + seed rotation),
    NOT from a PRNG stream: a tx and rx on different NumPy versions must
    derive the identical permutation over a real link (np.random.Generator
    streams are not cross-version stable; advisor round-4 finding).
    Adjacent coded bits land ~0.382*n apart - the best-possible low-
    discrepancy spacing for a fixed stride."""
    if n <= 1:
        return np.arange(max(n, 0))
    stride = max(1, round(n * (np.sqrt(5.0) - 1.0) / 2.0))
    while np.gcd(stride, n) != 1:
        stride -= 1
    return (seed + stride * np.arange(n, dtype=np.int64)) % n


def coded_bits_per_block(n_info: int) -> int:
    """Codeword length for ``n_info`` info bits (rate 1/2 + 6 tail bits)."""
    return 2 * (n_info + CONV_TAIL_BITS)


def info_bits_for_block(n_coded: int) -> int:
    """Largest info-bit count whose codeword fits in ``n_coded`` bits."""
    return n_coded // 2 - CONV_TAIL_BITS
