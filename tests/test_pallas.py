"""Pallas fused kernels vs the XLA planar pipeline (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdm_tpu import GfdmConfig
from gfdm_tpu.kernels import rx_core_fused, tx_frame_fused
from gfdm_tpu.ops import planar as pl_ops
from gfdm_tpu.ops.planar_pipeline import _device_mats, transmit_planar
from gfdm_tpu.ops.planar import pdiv, pmatmul
from gfdm_tpu.ref import utils

CFG = GfdmConfig()


def _planar_payload(batch, seed=0):
    d = np.stack(
        [utils.random_qpsk(CFG.n_data_symbols, seed=seed + i) for i in range(batch)]
    ).astype(np.complex64)
    return jnp.asarray(pl_ops.to_planar(d))


def test_tx_fused_matches_xla():
    data = _planar_payload(8, seed=0)
    ref = np.asarray(transmit_planar(CFG, data))[:, 0]
    got = np.asarray(tx_frame_fused(CFG, data, block=4))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_rx_core_fused_matches_xla():
    data = _planar_payload(8, seed=20)
    bursts = transmit_planar(CFG, data)[:, 0]
    n = CFG.block_len
    start = CFG.preamble_len + CFG.cp_len
    frames = bursts[..., start : start + n]
    # synthetic smooth channel
    h = np.fft.fft(np.array([1.0, 0.3 + 0.2j, 0.1]), n).astype(np.complex64)
    chan = jnp.asarray(
        np.broadcast_to(pl_ops.to_planar(h), (8, 2, n)).copy()
    )
    mats = _device_mats(CFG, "float32")
    ref = pmatmul(pdiv(pmatmul(frames, mats["F_W"]), chan), mats["Bfd_W"])
    got = rx_core_fused(CFG, frames, chan, block=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_rx_full_fused_matches_xla_pipeline():
    from gfdm_tpu.kernels import rx_full_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=40)
    bursts = transmit_planar(CFG, data)[:, 0]
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=2)
    got = rx_full_fused(CFG, bursts, ic_iterations=2, block=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape), atol=5e-4
    )


def test_rx_full_fused_zero_iterations():
    from gfdm_tpu.kernels import rx_full_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(4, seed=50)
    bursts = transmit_planar(CFG, data)[:, 0]
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=0)
    got = rx_full_fused(CFG, bursts, ic_iterations=0, block=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape), atol=5e-4
    )


def test_rx_ic_fused_matches_xla_pipeline():
    """2-D fused ZF+IC kernel == XLA receiver (equalize + IC, same channel)."""
    from gfdm_tpu.kernels import rx_ic_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=60)
    bursts = transmit_planar(CFG, data)[:, 0]
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=2)
    n = CFG.block_len
    start = CFG.preamble_len + CFG.cp_len
    frames = bursts[..., start : start + n]
    got = rx_ic_fused(CFG, frames, ref["channel"], ic_iterations=2, block=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape), atol=5e-4
    )


def test_rx_receiver_fused_circulant_matches_xla():
    """One-kernel receiver (est+ZF+demod+circulant IC) == XLA pipeline."""
    from gfdm_tpu.kernels.fused import rx_receiver_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=70)
    bursts = transmit_planar(CFG, data)[:, 0]
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=2)
    chan, got, _met = rx_receiver_fused(CFG, bursts, ic_iterations=2, block=4)
    np.testing.assert_allclose(
        np.asarray(chan), np.asarray(ref["channel"]).reshape(chan.shape), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape), atol=5e-4
    )


def test_receive_bursts_fused_composite_matches_xla():
    from gfdm_tpu.kernels.fused import receive_bursts_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=70)
    bursts = transmit_planar(CFG, data)[:, 0]
    rng = np.random.default_rng(2)
    noise = 0.01 * rng.standard_normal(np.asarray(bursts).shape).astype(np.float32)
    bursts = bursts + noise
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=2)
    got = receive_bursts_fused(CFG, bursts, ic_iterations=2, block=4)
    for key in ("data", "symbols", "channel"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(got["snr_lin"]), np.asarray(ref["snr_lin"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["cnrs"]), np.asarray(ref["cnrs"]), rtol=1e-2
    )


def test_link_step_fused_matches_xla():
    from gfdm_tpu.kernels.fused import link_step_fused
    from gfdm_tpu.ops.planar_pipeline import link_step_planar

    data = _planar_payload(8, seed=80)
    d_ref, snr_ref, evm_ref = link_step_planar(CFG, data, ic_iterations=2)
    d_got, snr_got, evm_got = link_step_fused(CFG, data, ic_iterations=2,
                                              tx_block=4, rx_block=4)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref), atol=1e-4)
    assert abs(float(evm_got) - float(evm_ref)) < 1e-4


def test_tx_fused_cyclic_shift_port():
    cfg = GfdmConfig(cyclic_shifts=(0, 4))
    d = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=90 + i) for i in range(4)]
    ).astype(np.complex64)
    data = jnp.asarray(pl_ops.to_planar(d))
    ref = np.asarray(transmit_planar(cfg, data))[:, 1]
    got = np.asarray(tx_frame_fused(cfg, data, block=4, shift_index=1))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_rx_receiver_factored_and_hybrid_match_xla():
    """Structure-exploiting receiver kernels are element-wise equivalent."""
    from gfdm_tpu.kernels.fused import rx_receiver_factored, rx_receiver_hybrid
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=100)
    bursts = transmit_planar(CFG, data)[:, 0]
    rng = np.random.default_rng(4)
    bursts = bursts + 0.01 * rng.standard_normal(
        np.asarray(bursts).shape
    ).astype(np.float32)
    ref = receive_bursts_planar(CFG, bursts, ic_iterations=2)
    for fn in (rx_receiver_factored, rx_receiver_hybrid):
        chan, sym = fn(CFG, bursts, ic_iterations=2, block=4)
        np.testing.assert_allclose(
            np.asarray(chan), np.asarray(ref["channel"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sym), np.asarray(ref["symbols"]), atol=1e-4
        )


def test_tx_cdd_fused_all_ports():
    from gfdm_tpu.kernels.fused import tx_cdd_fused

    cfg = GfdmConfig(cyclic_shifts=(0, 3, 7))
    d = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=110 + i) for i in range(4)]
    ).astype(np.complex64)
    data = jnp.asarray(pl_ops.to_planar(d))
    ref = np.asarray(transmit_planar(cfg, data))  # (B, 3, 2, frame_len)
    got = np.asarray(tx_cdd_fused(cfg, data, block=4))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_kernels_cross_config():
    """Fused Tx/Rx kernels generalize beyond the canonical config."""
    from gfdm_tpu.kernels.fused import receive_bursts_fused, tx_frame_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    for cfg in (
        GfdmConfig(subcarriers=32, active_subcarriers=24, timeslots=5,
                   cp_len=8, cs_len=4),
        GfdmConfig(subcarriers=128, active_subcarriers=100, timeslots=9,
                   cp_len=32, cs_len=16),
    ):
        d = np.stack(
            [utils.random_qpsk(cfg.n_data_symbols, seed=120 + i) for i in range(4)]
        ).astype(np.complex64)
        data = jnp.asarray(pl_ops.to_planar(d))
        ref_tx = np.asarray(transmit_planar(cfg, data))[:, 0]
        got_tx = np.asarray(tx_frame_fused(cfg, data, block=4))
        np.testing.assert_allclose(got_tx, ref_tx, atol=3e-5)

        rng = np.random.default_rng(5)
        bursts = jnp.asarray(
            ref_tx + 0.01 * rng.standard_normal(ref_tx.shape).astype(np.float32)
        )
        ref = receive_bursts_planar(cfg, bursts, ic_iterations=2)
        got = receive_bursts_fused(cfg, bursts, ic_iterations=2, block=4)
        np.testing.assert_allclose(
            np.asarray(got["symbols"]), np.asarray(ref["symbols"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["snr_lin"]), np.asarray(ref["snr_lin"]), rtol=1e-3
        )


def test_rx_receiver_factored_fast_estimator_matches():
    """estimator='fast' (channel streamed in, no dense E in VMEM) parity."""
    from gfdm_tpu.kernels.fused import rx_receiver_factored

    data = _planar_payload(8, seed=130)
    bursts = transmit_planar(CFG, data)[:, 0]
    rng = np.random.default_rng(5)
    bursts = bursts + 0.01 * rng.standard_normal(
        np.asarray(bursts).shape
    ).astype(np.float32)
    chan_f, sym_f = rx_receiver_factored(CFG, bursts, ic_iterations=2, block=4,
                                         estimator="fused")
    chan_g, sym_g = rx_receiver_factored(CFG, bursts, ic_iterations=2, block=4,
                                         estimator="fast")
    np.testing.assert_allclose(np.asarray(chan_g), np.asarray(chan_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sym_g), np.asarray(sym_f), atol=1e-4)


def test_rx_receiver_factored_fast_large_K():
    """K=256: the dense (4K, 2N) E no longer exists anywhere in the kernel.

    End-to-end correctness: clean link, ZF+IC output must recover the QPSK
    payload (the dense-operator reference path would need a 73 MB operator
    at this size)."""
    from gfdm_tpu.kernels.fused import rx_receiver_factored
    from gfdm_tpu.ops.tx import demap_indices

    cfg = GfdmConfig(subcarriers=256, active_subcarriers=200, timeslots=9,
                     cp_len=64, cs_len=32)
    d = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=140 + i) for i in range(2)]
    ).astype(np.complex64)
    data = jnp.asarray(pl_ops.to_planar(d))
    bursts = transmit_planar(cfg, data)[:, 0]
    chan, sym = rx_receiver_factored(cfg, bursts, ic_iterations=2, block=2,
                                     estimator="fast")
    got = np.asarray(jnp.take(sym, jnp.asarray(demap_indices(cfg)), axis=-1))
    got_c = got[:, 0] + 1j * got[:, 1]
    assert np.all(np.sign(got_c.real) == np.sign(d.real))
    assert np.all(np.sign(got_c.imag) == np.sign(d.imag))


def test_tx_frame_factored_matches_xla():
    """Factored one-kernel Tx == the XLA planar Tx chain at canonical K."""
    from gfdm_tpu.kernels.fused import tx_frame_factored

    data = _planar_payload(4, seed=61)
    ref = np.asarray(transmit_planar(CFG, data))[:, 0]
    got = np.asarray(tx_frame_factored(CFG, data, block=4))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_tx_frame_factored_large_K_link():
    """K=256 factored Tx -> factored Rx link (round-3 verdict item 5): no
    dense operator exists on either side (the dense Tx operator would be
    ~50 MB here, ~830 MB at K=1024), and the clean-link payload round-trips
    through the two Cooley-Tukey kernels."""
    from gfdm_tpu.kernels.fused import rx_receiver_factored, tx_frame_factored
    from gfdm_tpu.ops.tx import demap_indices

    cfg = GfdmConfig(subcarriers=256, active_subcarriers=200, timeslots=9,
                     cp_len=64, cs_len=32)
    d = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=150 + i) for i in range(2)]
    ).astype(np.complex64)
    data = jnp.asarray(pl_ops.to_planar(d).astype(np.float32))
    bursts = tx_frame_factored(cfg, data, block=2)
    ref = np.asarray(transmit_planar(cfg, data))[:, 0]
    np.testing.assert_allclose(np.asarray(bursts), ref, atol=2e-5)
    chan, sym = rx_receiver_factored(cfg, bursts, ic_iterations=2, block=2,
                                     estimator="fast")
    got = np.asarray(jnp.take(sym, jnp.asarray(demap_indices(cfg)), axis=-1))
    got_c = got[:, 0] + 1j * got[:, 1]
    assert np.all(np.sign(got_c.real) == np.sign(d.real))
    assert np.all(np.sign(got_c.imag) == np.sign(d.imag))


def test_default_link_block_and_auto_select():
    """block=None resolves to the measured-tuned VMEM block (256 at the
    canonical N=576, scaling down for larger frames) and still runs with
    small batches (clamped to the batch size)."""
    from gfdm_tpu.kernels.fused import default_link_block, link_single_fused

    assert default_link_block(CFG) == 256
    big = GfdmConfig(subcarriers=512, active_subcarriers=500)
    assert default_link_block(big) == 32
    assert default_link_block(GfdmConfig(subcarriers=128)) == 128

    data = _planar_payload(8, seed=91)
    ref = link_single_fused(CFG, data, ic_iterations=1, block=4)
    got = link_single_fused(CFG, data, ic_iterations=1, block=None)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=5e-5)


def test_link_single_fused_matches_split_link():
    """One-kernel Tx->VMEM burst->Rx link == the split two-kernel link."""
    from gfdm_tpu.kernels.fused import link_single_fused, link_step_fused

    data = _planar_payload(8, seed=90)
    ref = link_step_fused(CFG, data, ic_iterations=2, tx_block=4, rx_block=4)
    got = link_single_fused(CFG, data, ic_iterations=2, block=4)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-3)
    np.testing.assert_allclose(float(got[2]), float(ref[2]), atol=1e-5)


@pytest.mark.parametrize("name,order", [("qam16", 4), ("qam64", 6)])
def test_rx_receiver_fused_qam_matches_xla(name, order):
    """Fused receiver's per-axis Gray-QAM IC decisions == XLA nearest-point."""
    from gfdm_tpu.kernels.fused import rx_receiver_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar
    from gfdm_tpu.ref.symbolmapping import bits_to_symbols, constellation

    rng = np.random.default_rng(17)
    pts = constellation(order)
    d = np.stack([
        bits_to_symbols(rng.integers(0, 2, order * CFG.n_data_symbols), pts)
        for _ in range(8)
    ]).astype(np.complex64)
    data = jnp.asarray(pl_ops.to_planar(d))
    bursts = transmit_planar(CFG, data)[:, 0]
    ref = receive_bursts_planar(
        CFG, bursts, ic_iterations=2, constellation=pts
    )
    _chan, got, _met = rx_receiver_fused(
        CFG, bursts, ic_iterations=2, block=4, constellation=name
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape),
        atol=2e-3,
    )


def test_rx_receiver_fused_phase_compensation_matches_xla():
    """Fused one-shot common-phase-offset correction == XLA ic_receiver."""
    from gfdm_tpu.kernels.fused import rx_receiver_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=110)
    bursts = np.asarray(transmit_planar(CFG, data)[:, 0])
    # rotate only the data section by a common phase offset: a whole-burst
    # rotation would be absorbed by the preamble channel estimate + ZF, so
    # this is the residual-CPO case set_phase_compensation targets
    phi = 0.1
    c, s = np.cos(phi), np.sin(phi)
    rot = bursts.copy()
    p = CFG.preamble_len
    rot[:, 0, p:] = c * bursts[:, 0, p:] - s * bursts[:, 1, p:]
    rot[:, 1, p:] = s * bursts[:, 0, p:] + c * bursts[:, 1, p:]
    rot = rot.astype(np.float32)
    ref = receive_bursts_planar(
        CFG, jnp.asarray(rot), ic_iterations=2, phase_compensation=True
    )
    _chan, got, _met = rx_receiver_fused(
        CFG, jnp.asarray(rot), ic_iterations=2, block=4, phase_compensation=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape),
        atol=2e-3,
    )
    # and the correction genuinely matters: without it the symbols stay
    # rotated by ~phi
    _c2, got_off, _m2 = rx_receiver_fused(
        CFG, jnp.asarray(rot), ic_iterations=2, block=4,
        phase_compensation=False
    )
    from gfdm_tpu.ops.tx import demap_indices

    idx = np.asarray(demap_indices(CFG))
    err_on = np.abs(np.asarray(got)[..., idx] - np.asarray(data)).max()
    err_off = np.abs(np.asarray(got_off)[..., idx] - np.asarray(data)).max()
    assert err_off > 2 * err_on


def test_rx_receiver_fused_mmse_matches_xla():
    """Fused per-bin MMSE shrinkage == XLA equalizer='mmse' at low SNR."""
    from gfdm_tpu.kernels.fused import rx_receiver_fused
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    data = _planar_payload(8, seed=130)
    bursts = np.asarray(transmit_planar(CFG, data)[:, 0])
    rng = np.random.default_rng(5)
    bursts = bursts + 0.05 * rng.standard_normal(bursts.shape).astype(np.float32)
    ref = receive_bursts_planar(
        CFG, jnp.asarray(bursts), ic_iterations=2, equalizer="mmse"
    )
    _chan, got, _met = rx_receiver_fused(
        CFG, jnp.asarray(bursts), ic_iterations=2, block=4, equalizer="mmse"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref["symbols"]).reshape(got.shape),
        atol=2e-3,
    )


def test_rx_receiver_fused_matmul_ic_matches_conv():
    """ic_mode='matmul' (one Gauss gdot per IC iteration, bf16 operator)
    == the circulant-conv IC within the bf16-operator tolerance."""
    from gfdm_tpu.kernels.fused import rx_receiver_fused

    data = _planar_payload(8, seed=140)
    bursts = transmit_planar(CFG, data)[:, 0]
    _c1, conv, _m1 = rx_receiver_fused(CFG, bursts, ic_iterations=2, block=4)
    _c2, mm, _m2 = rx_receiver_fused(CFG, bursts, ic_iterations=2, block=4,
                                     ic_mode="matmul")
    # the interference term is ~-20 dB of signal; bf16 operator rounding
    # perturbs it by ~0.4% -> ~4e-3 absolute on symbols
    np.testing.assert_allclose(np.asarray(mm), np.asarray(conv), atol=5e-3)
    # and it must actually cancel interference (better than no IC)
    _c0, raw, _m0 = rx_receiver_fused(CFG, bursts, ic_iterations=0, block=4)
    idx_err = np.abs(np.asarray(raw) - np.asarray(conv)).max()
    mm_err = np.abs(np.asarray(mm) - np.asarray(conv)).max()
    assert mm_err < 0.1 * idx_err


def test_link_single_fused_matmul_ic():
    """One-kernel link with matmul IC == conv-IC link within bf16 tolerance."""
    from gfdm_tpu.kernels.fused import link_single_fused

    data = _planar_payload(8, seed=150)
    ref = link_single_fused(CFG, data, ic_iterations=2, block=4)
    got = link_single_fused(CFG, data, ic_iterations=2, block=4,
                            ic_mode="matmul")
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=5e-3)
    assert abs(float(got[2]) - float(ref[2])) < 5e-4
