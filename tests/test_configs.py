"""Cross-configuration parity: the ops must work for the same M/K ranges the
reference QA exercises (M=127/K=16, M=25/K=96, M=16/K=4, odd/even mixes)."""
import numpy as np
import pytest

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import rx, tx
from gfdm_tpu.ref import demodulation as demod_ref
from gfdm_tpu.ref import mapping as map_ref
from gfdm_tpu.ref import modulation as mod_ref
from gfdm_tpu.ref import utils

CONFIGS = [
    dict(timeslots=16, subcarriers=4, active_subcarriers=4, dc_free=False,
         cp_len=4, cs_len=2, filteralpha=0.35),
    dict(timeslots=127, subcarriers=16, active_subcarriers=16, dc_free=False,
         cp_len=16, cs_len=8, filteralpha=0.5),
    dict(timeslots=25, subcarriers=96, active_subcarriers=64, dc_free=True,
         cp_len=32, cs_len=16, filteralpha=0.3),
    dict(timeslots=5, subcarriers=128, active_subcarriers=110, dc_free=True,
         cp_len=64, cs_len=32, filteralpha=0.2),
]


@pytest.mark.parametrize("kwargs", CONFIGS)
def test_mod_demod_parity_across_configs(kwargs):
    cfg = GfdmConfig(**kwargs)
    d = utils.random_qpsk(cfg.block_len, seed=1)
    got_mod = np.asarray(tx.modulate(cfg, d[None]))[0]
    ref_mod = mod_ref.modulate_block(
        d.reshape(cfg.subcarriers, cfg.timeslots), cfg.tx_filter_taps, cfg.overlap
    )
    np.testing.assert_allclose(got_mod, ref_mod, atol=5e-5)

    got_dem = np.asarray(rx.demodulate(cfg, ref_mod[None]))[0]
    ref_dem = demod_ref.demodulate_block(ref_mod, cfg.rx_filter_taps, cfg.overlap)
    np.testing.assert_allclose(got_dem, ref_dem, atol=5e-5)


@pytest.mark.parametrize("kwargs", CONFIGS[:2])
def test_full_link_across_configs(kwargs):
    from gfdm_tpu.runtime.receiver import receive_bursts

    cfg = GfdmConfig(**kwargs)
    data = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=2 + i) for i in range(2)]
    )
    bursts = np.asarray(tx.transmit(cfg, data))[:, 0, :]
    out = receive_bursts(cfg, bursts, ic_iterations=4)
    d_hat = np.asarray(out["data"])
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 1e-4


def test_mapper_orders_across_configs():
    cfg = GfdmConfig(timeslots=15, subcarriers=32, active_subcarriers=24,
                     per_timeslot=False, dc_free=False, cp_len=8, cs_len=4)
    d = utils.random_qpsk(cfg.n_data_symbols, seed=7)
    got = np.asarray(tx.map_resources(cfg, d[None]))[0]
    ref = map_ref.map_to_resources(
        d, cfg.timeslots, cfg.subcarriers, cfg.subcarrier_map, per_timeslot=False
    ).reshape(-1)
    np.testing.assert_allclose(got, ref, atol=1e-7)
    back = np.asarray(rx.demap_resources(cfg, got[None]))[0]
    np.testing.assert_allclose(back, d, atol=1e-6)
