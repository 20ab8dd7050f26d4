"""Parity of the complex-free (planar) TPU path vs the complex ops.

The planar pipeline is the production TPU path (the axon TPU backend cannot
transfer complex dtypes); it must agree element-wise with the complex ops,
which are themselves validated against the float64 golden model.
"""
import jax.numpy as jnp
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import burst as burst_ops
from gfdm_tpu.ops import planar as pl
from gfdm_tpu.ops import planar_pipeline as pp
from gfdm_tpu.ops import sync as sync_ops
from gfdm_tpu.ops import tx as tx_ops
from gfdm_tpu.ref import utils
from gfdm_tpu.runtime.receiver import receive_bursts

CFG = GfdmConfig()
BATCH = 3


def _payloads(cfg, batch, seed=0):
    return np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=seed + i) for i in range(batch)]
    ).astype(np.complex64)


def test_planar_primitives():
    a = utils.random_samples(64, seed=1).astype(np.complex64)
    b = utils.random_samples(64, seed=2).astype(np.complex64)
    ap, bp = jnp.asarray(pl.to_planar(a)), jnp.asarray(pl.to_planar(b))
    np.testing.assert_allclose(pl.from_planar(pl.pmul(ap, bp)), a * b, atol=1e-5)
    np.testing.assert_allclose(pl.from_planar(pl.pconj(ap)), np.conj(a), atol=1e-6)
    np.testing.assert_allclose(pl.from_planar(pl.pdiv(ap, bp)), a / b, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pl.pabs2(ap)), np.abs(a) ** 2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl.pangle(ap)), np.angle(a), atol=1e-5)

    W = utils.random_samples(64 * 32, seed=3).reshape(64, 32).astype(np.complex64)
    Wr = pl.real_operator(W)
    got = pl.from_planar(pl.pmatmul(ap[None], jnp.asarray(Wr)))[0]
    np.testing.assert_allclose(got, a @ W, atol=1e-4)


def test_planar_transmit_matches_complex():
    cfg = GfdmConfig(cyclic_shifts=(0, 4))
    data = _payloads(cfg, BATCH, seed=10)
    ref = np.asarray(tx_ops.transmit(cfg, data))  # (B, S, L) complex
    got = pl.from_planar(np.asarray(pp.transmit_planar(cfg, jnp.asarray(pl.to_planar(data)))))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_planar_receive_matches_complex():
    data = _payloads(CFG, BATCH, seed=20)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    # add light noise so the SNR estimate is finite (not float-eps dominated)
    rng = np.random.default_rng(1)
    bursts = bursts + 1e-3 * (
        rng.standard_normal(bursts.shape) + 1j * rng.standard_normal(bursts.shape)
    ).astype(np.complex64)
    ref = receive_bursts(CFG, bursts, ic_iterations=3)
    got = pp.receive_bursts_planar(
        CFG, jnp.asarray(pl.to_planar(bursts)), ic_iterations=3
    )
    np.testing.assert_allclose(
        pl.from_planar(np.asarray(got["data"])), np.asarray(ref["data"]), atol=5e-4
    )
    np.testing.assert_allclose(
        pl.from_planar(np.asarray(got["channel"])), np.asarray(ref["channel"]), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["snr_lin"]), np.asarray(ref["snr_lin"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["cnrs"]), np.asarray(ref["cnrs"]), rtol=1e-2
    )


def test_planar_receive_phase_compensation_matches_complex():
    from gfdm_tpu.ops import rx as rx_ops

    cfg = GfdmConfig(filteralpha=0.5, active_subcarriers=64, dc_free=False)
    data = _payloads(cfg, 2, seed=25)
    core = np.asarray(tx_ops.transmit_core(cfg, data)) * np.exp(1j * 0.1)
    ref = np.asarray(
        rx_ops.ic_receiver(cfg, core, ic_iterations=4, phase_compensation=True)
    )
    # planar path via the full receiver needs framed bursts; test the IC core
    # by framing with clean preamble/CP
    bursts = np.asarray(tx_ops.transmit(cfg, data))[:, 0, :] * np.exp(1j * 0.1)
    got = pp.receive_bursts_planar(
        cfg,
        jnp.asarray(pl.to_planar(bursts)),
        ic_iterations=4,
        equalize=False,
        phase_compensation=True,
    )
    ref2 = receive_bursts(
        cfg, bursts, ic_iterations=4, equalize=False, phase_compensation=True
    )
    np.testing.assert_allclose(
        pl.from_planar(np.asarray(got["symbols"])),
        np.asarray(ref2["symbols"]),
        atol=5e-4,
    )


def test_planar_detection_matches_complex():
    data = _payloads(CFG, BATCH, seed=30)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    chunk_len = 2048
    offset = 300
    stream = np.zeros((BATCH, chunk_len), dtype=np.complex64)
    stream[:, offset : offset + CFG.frame_len] = bursts
    rng = np.random.default_rng(0)
    stream += 0.01 * (
        rng.standard_normal(stream.shape) + 1j * rng.standard_normal(stream.shape)
    ).astype(np.complex64)

    ref = sync_ops.detect_bursts(CFG, jnp.asarray(stream))
    got = pp.detect_bursts_planar(CFG, jnp.asarray(pl.to_planar(stream)))
    np.testing.assert_array_equal(np.asarray(got["start"]), np.asarray(ref["start"]))
    np.testing.assert_allclose(np.asarray(got["cfo"]), np.asarray(ref["cfo"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["scale"]), np.asarray(ref["scale"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["strength"]), np.asarray(ref["strength"]), rtol=1e-3
    )

    ref_b = np.asarray(burst_ops.extract_bursts(CFG, jnp.asarray(stream), ref))
    got_b = pl.from_planar(
        np.asarray(pp.extract_bursts_planar(CFG, jnp.asarray(pl.to_planar(stream)), got))
    )
    np.testing.assert_allclose(got_b, ref_b, atol=1e-4)


def test_planar_link_step_end_to_end():
    data = _payloads(CFG, 4, seed=40)
    dp = jnp.asarray(pl.to_planar(data))
    d_hat, snr, evm = pp.link_step_planar(CFG, dp, ic_iterations=2)
    d_hat_c = pl.from_planar(np.asarray(d_hat))
    assert utils.evm(utils.qpsk_hard_map(d_hat_c), data) < 1e-5
    assert float(np.asarray(evm)) < 0.2


def test_mmse_equalizer_beats_zf_at_low_snr():
    """MMSE regularization (beyond the reference's ZF) wins in deep fades."""
    import jax

    from gfdm_tpu.runtime import channel as chan_sim

    rng = np.random.default_rng(0)
    batch = 64
    data = np.stack(
        [utils.random_qpsk(CFG.n_data_symbols, seed=300 + i) for i in range(batch)]
    ).astype(np.complex64)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    # frequency-selective channel with a deep notch + strong noise
    h = np.array([1.0, -0.1, 0.0, 0.85])
    faded = np.asarray(chan_sim.multipath(jnp.asarray(bursts), jnp.asarray(h)))
    noisy = np.asarray(chan_sim.awgn(jax.random.PRNGKey(7), jnp.asarray(faded), 8.0))
    pb = jnp.asarray(pl.to_planar(noisy))

    errs = {}
    for eq in ["zf", "mmse", "mmse_cnr"]:
        out = pp.receive_bursts_planar(CFG, pb, ic_iterations=0, equalizer=eq)
        d_hat = pl.from_planar(np.asarray(out["data"]))
        hard = utils.qpsk_hard_map(d_hat)
        errs[eq] = np.mean(np.abs(hard - data) > 0.1)
    assert errs["mmse"] <= errs["zf"]
    assert errs["mmse_cnr"] <= errs["zf"]


def test_cnr_interpolation_operator_flat_and_mmse_cnr_high_snr():
    from gfdm_tpu.ops import operators

    # a flat CNR vector must interpolate to a flat per-bin CNR
    A = operators.cnr_interpolation_operator(CFG)
    assert A.shape == (CFG.block_len, 2 * (CFG.active_subcarriers // 2))
    np.testing.assert_allclose(A @ np.ones(A.shape[1]), 1.0, atol=1e-12)

    # at high SNR the per-bin MMSE shrinkage -> 1, i.e. mmse_cnr == zf
    data = _payloads(CFG, 4, seed=50)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    rng = np.random.default_rng(3)
    bursts = bursts + 1e-4 * (
        rng.standard_normal(bursts.shape) + 1j * rng.standard_normal(bursts.shape)
    ).astype(np.complex64)
    pb = jnp.asarray(pl.to_planar(bursts))
    out_zf = pp.receive_bursts_planar(CFG, pb, ic_iterations=0, equalizer="zf")
    out_pb = pp.receive_bursts_planar(CFG, pb, ic_iterations=0, equalizer="mmse_cnr")
    np.testing.assert_allclose(
        np.asarray(out_pb["data"]), np.asarray(out_zf["data"]), atol=1e-3
    )


def test_mmse_channel_complex_helper():
    import jax

    from gfdm_tpu.ops import estimation as est_ops
    from gfdm_tpu.ops import rx as rx_ops
    from gfdm_tpu.runtime import channel as chan_sim

    data = _payloads(CFG, 8, seed=60)
    bursts = np.asarray(tx_ops.transmit(CFG, data))[:, 0, :]
    # flat channel: at high SNR every MMSE variant must reduce to ZF
    # (with a notched channel they legitimately differ at the fade bins)
    h = np.array([1.0 + 0.2j])
    faded = np.asarray(chan_sim.multipath(jnp.asarray(bursts), jnp.asarray(h)))
    noisy = np.asarray(chan_sim.awgn(jax.random.PRNGKey(9), jnp.asarray(faded), 30.0))

    pre = noisy[:, CFG.cp_len : CFG.cp_len + 2 * CFG.subcarriers]
    channel = est_ops.estimate_frame(CFG, pre)
    snr_lin, cnrs = est_ops.estimate_snr(CFG, pre)
    start = CFG.preamble_len + CFG.cp_len
    frames = noisy[:, start : start + CFG.block_len]

    # at 30 dB both MMSE variants must essentially match plain ZF
    d_zf = rx_ops.demodulate_equalized(CFG, frames, channel)
    for kwargs in ({"snr_lin": snr_lin}, {"cnrs": cnrs}):
        ch_eff = est_ops.mmse_channel(CFG, channel, **kwargs)
        d_mmse = rx_ops.demodulate_equalized(CFG, frames, ch_eff)
        np.testing.assert_allclose(
            np.asarray(d_mmse), np.asarray(d_zf), atol=5e-3
        )


def test_qpsk_llrs_sign_and_scale():
    from gfdm_tpu.ops.softbits import qpsk_llrs, qpsk_llrs_planar

    syms = np.array([0.7 + 0.7j, -0.7 + 0.1j], dtype=np.complex64)
    nv = np.array(0.5, dtype=np.float32)
    llr = np.asarray(qpsk_llrs(jnp.asarray(syms), jnp.asarray(nv)))
    assert llr.shape == (2, 2)
    # positive component -> positive LLR (bit 0 likely)
    assert llr[0, 0] > 0 and llr[0, 1] > 0
    assert llr[1, 0] < 0 and llr[1, 1] > 0
    # planar variant agrees
    llr_p = np.asarray(
        qpsk_llrs_planar(jnp.asarray(pl.to_planar(syms)), jnp.asarray(nv))
    )
    np.testing.assert_allclose(llr_p, llr, atol=1e-6)
    # doubling noise halves LLR magnitude
    llr2 = np.asarray(qpsk_llrs(jnp.asarray(syms), jnp.asarray(nv * 2)))
    np.testing.assert_allclose(llr2, llr / 2, atol=1e-6)


def test_maxlog_llrs_generic():
    from gfdm_tpu.ops.softbits import maxlog_llrs, qpsk_llrs
    from gfdm_tpu.ref import symbolmapping as sm

    rng = np.random.default_rng(0)
    # QPSK: max-log must reduce exactly to the closed-form LLRs
    pts = sm.constellation(2)
    y = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
        np.complex64
    ) * 0.7
    nv = np.float32(0.3)
    got = np.asarray(maxlog_llrs(y, pts, nv))
    ref = np.asarray(qpsk_llrs(jnp.asarray(y), jnp.asarray(nv)))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # 16-QAM: at high SNR, LLR signs recover the transmitted bits
    pts16 = sm.constellation(4)
    bits = rng.integers(0, 2, 128 * 4).astype(np.uint8)
    syms = sm.bits_to_symbols(bits, pts16).astype(np.complex64)
    noisy = syms + 0.02 * (
        rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape)
    ).astype(np.complex64)
    llr = np.asarray(maxlog_llrs(noisy, pts16, np.float32(0.01)))
    hard_bits = (llr < 0).astype(np.uint8).reshape(-1)
    np.testing.assert_array_equal(hard_bits, bits)

    # 64-QAM: same sign-consistency property on the denser grid
    pts64 = sm.constellation(6)
    bits = rng.integers(0, 2, 128 * 6).astype(np.uint8)
    syms = sm.bits_to_symbols(bits, pts64).astype(np.complex64)
    noisy = syms + 0.01 * (
        rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape)
    ).astype(np.complex64)
    llr = np.asarray(maxlog_llrs(noisy, pts64, np.float32(0.005)))
    hard_bits = (llr < 0).astype(np.uint8).reshape(-1)
    np.testing.assert_array_equal(hard_bits, bits)
