"""Out-of-band emission + PAPR study: GFDM vs plain OFDM.

The quantified version of the reference's spectrum plots
(gfdm_plot_utils.py) and PAPR experiment (zadoff_chu.py __main__):
identical QPSK payload grids modulated three ways, then OOB attenuation
(in-band vs out-of-band mean PSD) and the PAPR CCDF.

Run: python examples/spectrum_study.py   (CPU, ~20 s)
Saves spectrum_study.png when matplotlib is available.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from gfdm_tpu import GfdmConfig
from gfdm_tpu.eval.spectrum import spectrum_study, welch_psd


def main():
    cfg = GfdmConfig()
    res = spectrum_study(cfg, n_bursts=128)
    print(f"config: K={cfg.subcarriers} active={cfg.active_subcarriers} "
          f"M={cfg.timeslots} {cfg.filtertype} alpha={cfg.filteralpha} "
          f"ramp={cfg.ramp_len}")
    print(f"{'waveform':>12}  {'OOB atten':>10}  {'median PAPR':>12}")
    for name in ("gfdm_frame", "gfdm_core", "ofdm"):
        r = res[name]
        print(f"{name:>12}  {r['oob_attenuation_db']:7.2f} dB"
              f"  {r['papr_median_db']:9.2f} dB")
    print("\nPAPR CCDF  P(PAPR > x):")
    t = res["ofdm"]["papr_thresholds_db"]
    print("  x[dB]:   " + "  ".join(f"{x:5.1f}" for x in t[::2]))
    for name in ("gfdm_frame", "ofdm"):
        c = res[name]["papr_ccdf"]
        print(f"  {name:>10} " + "  ".join(f"{v:5.3f}" for v in c[::2]))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from gfdm_tpu.eval.spectrum import _ofdm_modulate, _payload_grids
        from gfdm_tpu.ref import cyclic_prefix as ref_cp
        from gfdm_tpu.ref import modulation as ref_modulation

        grids = _payload_grids(cfg, 128, 7)
        core = np.stack(
            [ref_modulation.modulate_block(g, cfg.tx_filter_taps, cfg.overlap)
             for g in grids]
        )
        framed = np.stack(
            [ref_cp.add_cyclic_prefix(b, cfg.cp_len, cfg.cs_len,
                                      cfg.window_taps, cfg.ramp_len)
             for b in core]
        )
        fig, ax = plt.subplots(figsize=(7, 4))
        for name, sig in (("GFDM frame (windowed)", framed),
                          ("plain OFDM", _ofdm_modulate(grids))):
            f, p = welch_psd(sig)
            ax.plot(f, 10 * np.log10(p / p.max() + 1e-12), label=name)
        ax.set_xlabel("frequency [cycles/sample]")
        ax.set_ylabel("normalized PSD [dB]")
        ax.legend(); ax.grid(True)
        fig.savefig("spectrum_study.png", dpi=120, bbox_inches="tight")
        print("\nwrote spectrum_study.png")
    except ImportError:
        print("\n(matplotlib unavailable - numbers only)")


if __name__ == "__main__":
    main()
