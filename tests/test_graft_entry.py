"""Driver integration: entry() compile-check and multichip dry run."""
import numpy as np


def test_entry_step_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    d_hat, snr, evm = [np.asarray(o) for o in out]
    assert d_hat.shape == args[0].shape
    assert snr.shape == (args[0].shape[0],)
    assert np.isfinite(evm) and float(evm) < 0.05


def test_dryrun_multichip_excercises_dp_sp():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally (finite EVM)
