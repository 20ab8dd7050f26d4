"""Sharding tests on a virtual 8-device CPU mesh.

Assert shard-vs-single-device equivalence (SURVEY.md section 4 implication):
the same link step produces identical results when bursts are sharded over
'dp' and when stream chunks are sharded over 'sp' with halo exchange.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import sync as sync_ops
from gfdm_tpu.parallel import detect_bursts_sharded, make_mesh, shard_bursts
from gfdm_tpu.ref import utils
from gfdm_tpu.runtime.receiver import receive_bursts
from gfdm_tpu.runtime.transmitter import transmit_bursts

CFG = GfdmConfig()


def _payloads(cfg, batch, seed=0):
    return np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=seed + i) for i in range(batch)]
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_sharded_link_matches_single_device():
    mesh = make_mesh(dp=8, sp=1)
    batch = 16
    data = _payloads(CFG, batch).astype(np.complex64)

    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]
    out_single = receive_bursts(CFG, bursts, ic_iterations=2)

    bursts_sharded = shard_bursts(mesh, jnp.asarray(bursts))
    out_sharded = receive_bursts(CFG, bursts_sharded, ic_iterations=2)

    np.testing.assert_allclose(
        np.asarray(out_single["data"]), np.asarray(out_sharded["data"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_single["snr_lin"]), np.asarray(out_sharded["snr_lin"]), rtol=1e-4
    )


def test_sp_halo_exchange_finds_boundary_straddling_burst():
    """A burst crossing an 'sp' chunk boundary is recovered via the halo."""
    mesh = make_mesh(dp=2, sp=4)
    n_sp = 4
    chunk_len = 2048
    batch = 2
    data = _payloads(CFG, batch, seed=7).astype(np.complex64)
    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]

    stream = np.zeros((batch, n_sp * chunk_len), dtype=np.complex64)
    # place the burst so it straddles the boundary between chunk 1 and 2
    offset = 2 * chunk_len - CFG.frame_len // 2
    stream[:, offset : offset + CFG.frame_len] = bursts

    sharded = jax.device_put(
        jnp.asarray(stream), NamedSharding(mesh, P("dp", "sp"))
    )
    det, extracted = detect_bursts_sharded(CFG, mesh, sharded, halo=CFG.frame_len + 64)

    starts = np.asarray(det["start"])
    owned = np.asarray(det["owned"])
    strength = np.asarray(det["strength"])

    # chunk 1 owns the burst: local start = offset - chunk_len + cp_len
    expect_local = offset - chunk_len + CFG.cp_len
    assert np.all(np.abs(starts[:, 1] - expect_local) <= 2)
    assert np.all(owned[:, 1])
    # and its detection is by far the strongest owned one
    assert np.all(strength[:, 1] > 2 * strength[:, 0])

    # the extracted burst from chunk 1 demodulates back to the payload
    out = receive_bursts(CFG, jnp.asarray(extracted[:, 1, :]), ic_iterations=2)
    d_hat = np.asarray(out["data"])
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 1e-5


def test_sharded_detection_matches_unsharded_on_owner_chunk():
    mesh = make_mesh(dp=2, sp=4)
    n_sp, chunk_len, batch = 4, 2048, 2
    data = _payloads(CFG, batch, seed=11).astype(np.complex64)
    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]
    stream = np.zeros((batch, n_sp * chunk_len), dtype=np.complex64)
    offset = 100  # well inside chunk 0
    stream[:, offset : offset + CFG.frame_len] = bursts

    sharded = jax.device_put(jnp.asarray(stream), NamedSharding(mesh, P("dp", "sp")))
    det, _ = detect_bursts_sharded(CFG, mesh, sharded, halo=CFG.frame_len + 64)

    # single-device detection on the same chunk with the same halo width
    ext = jnp.asarray(stream[:, : chunk_len + CFG.frame_len + 64])
    det_ref = sync_ops.detect_bursts(CFG, ext)
    np.testing.assert_array_equal(
        np.asarray(det["start"])[:, 0], np.asarray(det_ref["start"])
    )
    np.testing.assert_allclose(
        np.asarray(det["cfo"])[:, 0], np.asarray(det_ref["cfo"]), atol=1e-7
    )


def test_sp_ownership_dedups_dual_detection():
    """A burst visible to TWO shards - its owner and the left neighbour
    (through the halo) - is detected by both, and exactly one survives the
    ownership mask (the sharded analogue of the reference's partial-burst
    deferral, extract_burst_cc_impl.cc:214-228)."""
    mesh = make_mesh(dp=2, sp=4)
    n_sp, chunk_len, batch = 4, 2048, 2
    halo = CFG.frame_len + 64
    data = _payloads(CFG, batch, seed=31).astype(np.complex64)
    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]
    stream = 0.01 * (
        np.random.default_rng(3).standard_normal((batch, n_sp * chunk_len))
        + 1j * np.random.default_rng(4).standard_normal((batch, n_sp * chunk_len))
    ).astype(np.complex64)
    # burst near the START of chunk 2: chunk 1's halo (= chunk 2's head)
    # contains the full preamble, so shard 1 sees it too - unowned
    p_local = 150
    offset = 2 * chunk_len + p_local
    stream[:, offset : offset + CFG.frame_len] += bursts

    sharded = jax.device_put(jnp.asarray(stream), NamedSharding(mesh, P("dp", "sp")))
    det, extracted = detect_bursts_sharded(CFG, mesh, sharded, halo=halo)

    starts = np.asarray(det["start"])
    owned = np.asarray(det["owned"])
    found = np.asarray(det["found"])

    core = p_local + CFG.cp_len
    # owner (shard 2): owned + found at the local core-preamble start
    assert np.all(np.abs(starts[:, 2] - core) <= 2)
    assert np.all(owned[:, 2]) and np.all(found[:, 2])
    # left neighbour (shard 1): detects the SAME burst inside its halo -
    # start >= chunk_len, hence owned=False, found=False (the mask is the
    # thing discriminating, not the search limit)
    assert np.all(np.abs(starts[:, 1] - (chunk_len + core)) <= 2)
    assert not owned[:, 1].any() and not found[:, 1].any()
    # exactly one shard keeps the burst; noise shards are CFAR-rejected
    assert np.all(found.sum(axis=1) == 1)

    # the surviving extraction demodulates back to the payload
    out = receive_bursts(CFG, jnp.asarray(extracted[:, 2, :]), ic_iterations=2)
    d_hat = np.asarray(out["data"])
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 2e-2


def test_sp_topk_keeps_dense_bursts_per_shard():
    """With max_bursts_per_chunk > 1 each sp shard keeps ALL its owned
    bursts (the sharded analogue of the reference processing several tags
    per work() call, extract_burst_cc_impl.cc:131-149). Round-3 verdict
    item 8: the single-slot path silently dropped the second burst."""
    mesh = make_mesh(dp=2, sp=4)
    n_sp, chunk_len, batch = 4, 4096, 2
    halo = CFG.frame_len + 64
    data_a = _payloads(CFG, batch, seed=41).astype(np.complex64)
    data_b = _payloads(CFG, batch, seed=43).astype(np.complex64)
    bursts_a = np.asarray(transmit_bursts(CFG, data_a))[:, 0, :]
    bursts_b = np.asarray(transmit_bursts(CFG, data_b))[:, 0, :]
    stream = 0.01 * (
        np.random.default_rng(5).standard_normal((batch, n_sp * chunk_len))
        + 1j * np.random.default_rng(6).standard_normal((batch, n_sp * chunk_len))
    ).astype(np.complex64)
    # TWO bursts inside chunk 1, more than a frame apart
    off_a = chunk_len + 100
    off_b = chunk_len + 100 + CFG.frame_len + 400
    stream[:, off_a : off_a + CFG.frame_len] += bursts_a
    stream[:, off_b : off_b + CFG.frame_len] += bursts_b

    sharded = jax.device_put(jnp.asarray(stream), NamedSharding(mesh, P("dp", "sp")))
    det, extracted = detect_bursts_sharded(
        CFG, mesh, sharded, halo=halo, max_bursts_per_chunk=2
    )

    found = np.asarray(det["found"])  # (batch, n_sp, 2)
    starts = np.asarray(det["start"])
    assert found.shape == (batch, n_sp, 2)
    # shard 1 keeps both; nothing else fires
    assert np.all(found[:, 1, :].sum(axis=-1) == 2)
    assert np.all(found[:, [0, 2, 3], :].sum(axis=(-2, -1)) == 0)
    got = np.sort(starts[:, 1, :], axis=-1)
    expect = np.sort([off_a - chunk_len + CFG.cp_len, off_b - chunk_len + CFG.cp_len])
    assert np.all(np.abs(got - expect[None, :]) <= 2)

    # both extractions demodulate back to their payloads
    slot_of_a = np.argmin(np.abs(starts[:, 1, :] - expect[0]), axis=-1)
    for b in range(batch):
        ia, ib = slot_of_a[b], 1 - slot_of_a[b]
        out_a = receive_bursts(CFG, jnp.asarray(extracted[b : b + 1, 1, ia]),
                               ic_iterations=2)
        out_b = receive_bursts(CFG, jnp.asarray(extracted[b : b + 1, 1, ib]),
                               ic_iterations=2)
        assert utils.evm(utils.qpsk_hard_map(np.asarray(out_a["data"])),
                         data_a[b : b + 1]) < 2e-2
        assert utils.evm(utils.qpsk_hard_map(np.asarray(out_b["data"])),
                         data_b[b : b + 1]) < 2e-2


def test_dp_receiver_compiles_without_collectives():
    """Steady-state burst processing is embarrassingly parallel: the
    dp-sharded receiver program must contain NO cross-chip collectives
    (the basis of the near-linear scaling claim; only the sp halo exchange
    and explicit metric psums communicate)."""
    import jax.numpy as jnp

    from gfdm_tpu.ops import planar as pl
    from gfdm_tpu.ops.planar_pipeline import receive_bursts_planar

    mesh = make_mesh(dp=8, sp=1)
    batch = 16
    data = _payloads(CFG, batch).astype(np.complex64)
    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]
    pb = jax.device_put(
        jnp.asarray(pl.to_planar(bursts)),
        NamedSharding(mesh, P("dp", None, None)),
    )

    @jax.jit
    def rx_step(b):
        return receive_bursts_planar(CFG, b, ic_iterations=2)["data"]

    hlo = rx_step.lower(pb).compile().as_text()
    for coll in ["all-reduce", "all-gather", "collective-permute", "all-to-all",
                 "reduce-scatter"]:
        assert coll not in hlo, f"unexpected collective {coll} in dp program"
