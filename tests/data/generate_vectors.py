"""Generate independently derived golden vectors for cross-validation.

This script imports NOTHING from gfdm_tpu — every expectation is computed
from published closed-form definitions (citations below), playing the role
the third-party Vodafone-Chair gfdm-lib submodule plays for the reference
(/root/reference/python/qa_vc_compatibility_check.py:42-155,
/root/reference/.gitmodules:1-3). The output JSON is checked in; regenerate
with `python tests/data/generate_vectors.py`.

Sources of the formulas:
  - Raised-cosine / root-raised-cosine pulses: standard digital-
    communications closed forms (e.g. Proakis, "Digital Communications",
    5th ed., eq. 9.2-26/9.2-27).
  - Zadoff-Chu sequences: x_u[n] = exp(-j pi u n (n + cf) / N_ZC),
    cf = N_ZC mod 2 (Chu 1972; 3GPP TS 36.211 sec. 5.7.2/6.11.1.1).
  - GFDM modulation matrix: g_{k,m}[n] = g[(n - mK) mod N] *
    exp(j 2 pi k n / K) (Michailow et al., "Generalized Frequency Division
    Multiplexing for 5th Generation Cellular Networks", IEEE Trans.
    Commun. 2014, eq. (5)).
"""
import json
from pathlib import Path

import numpy as np


def rc_closed_form(t, alpha):
    """Raised-cosine pulse h(t) = sinc(t) cos(pi a t) / (1 - (2 a t)^2)."""
    t = np.asarray(t, dtype=np.float64)
    if alpha == 0.0:
        return np.sinc(t)
    den = 1.0 - (2.0 * alpha * t) ** 2
    sing = np.isclose(den, 0.0)
    out = np.where(
        sing,
        (np.pi / 4.0) * np.sinc(1.0 / (2.0 * alpha)),
        np.sinc(t) * np.cos(np.pi * alpha * t) / np.where(sing, 1.0, den),
    )
    return out


def rrc_closed_form(t, alpha):
    """Root-raised-cosine pulse (Proakis eq. 9.2-27 form)."""
    t = np.asarray(t, dtype=np.float64)
    if alpha == 0.0:
        return np.sinc(t)
    out = np.zeros_like(t)
    zero = t == 0.0
    sing = np.isclose(np.abs(t), 1.0 / (4.0 * alpha))
    reg = ~(zero | sing)
    tr = t[reg]
    out[reg] = (
        np.sin(np.pi * tr * (1.0 - alpha))
        + 4.0 * alpha * tr * np.cos(np.pi * tr * (1.0 + alpha))
    ) / (np.pi * tr * (1.0 - (4.0 * alpha * tr) ** 2))
    out[zero] = 1.0 - alpha + 4.0 * alpha / np.pi
    out[sing] = (alpha / np.sqrt(2.0)) * (
        (1.0 + 2.0 / np.pi) * np.sin(np.pi / (4.0 * alpha))
        + (1.0 - 2.0 / np.pi) * np.cos(np.pi / (4.0 * alpha))
    )
    return out


def rc_spectrum(fT, alpha):
    """Raised-cosine frequency response (unit symbol rate), Proakis 9.2-26."""
    fT = np.abs(np.asarray(fT, dtype=np.float64))
    lo = (1.0 - alpha) / 2.0
    hi = (1.0 + alpha) / 2.0
    if alpha == 0.0:
        return (fT <= lo).astype(np.float64)
    roll = 0.5 * (1.0 + np.cos(np.pi / alpha * (fT - lo)))
    return np.where(fT <= lo, 1.0, np.where(fT <= hi, roll, 0.0))


def zadoff_chu(N, u):
    """x_u[n] = exp(-j pi u n (n + cf) / N), cf = N mod 2 (Chu 1972)."""
    n = np.arange(N)
    return np.exp(-1j * np.pi * u * n * (n + (N % 2)) / N)


def c2l(z):
    """complex array -> [[re, im], ...] JSON-serializable list."""
    z = np.asarray(z, dtype=np.complex128)
    return np.stack([z.real, z.imag], axis=-1).tolist()


def main():
    vectors = {}

    # --- RC/RRC pulse samples on the GFDM sampling grid ------------------
    # t_x = (x - N/2) / K symbol periods, N = M*K taps (the grid every GFDM
    # prototype-pulse in this framework is sampled on).
    M, K = 9, 64
    N = M * K
    t = (np.arange(N) - N / 2.0) / K
    probe_idx = [0, 13, 100, N // 2 - 32, N // 2, N // 2 + 1, N // 2 + 57,
                 N - 200, N - 1]
    vectors["pulse_grid"] = {
        "timeslots": M, "subcarriers": K, "probe_idx": probe_idx,
        "alphas": [0.2, 0.35, 0.5, 1.0],
        "rc": {}, "rrc": {},
    }
    for a in vectors["pulse_grid"]["alphas"]:
        vectors["pulse_grid"]["rc"][str(a)] = rc_closed_form(
            t[probe_idx], a
        ).tolist()
        vectors["pulse_grid"]["rrc"][str(a)] = rrc_closed_form(
            t[probe_idx], a
        ).tolist()

    # hand-checkable special values
    vectors["pulse_special"] = {
        # h_rc(0) = 1 for every alpha
        "rc_t0": 1.0,
        # h_rrc(0) = 1 - a + 4a/pi at alpha = 0.2
        "rrc_t0_alpha0.2": 1.0 - 0.2 + 4.0 * 0.2 / np.pi,
        # RC singular point t = 1/(2a) at alpha=0.5 -> t=1: (pi/4) sinc(1) = 0
        "rc_sing_alpha0.5": 0.0,
    }

    # --- RC spectrum (for checking the FD taps) ---------------------------
    # DFT bin i of the length-N pulse corresponds to fT = i/M; taps are
    # checked over the sparse band |i| < M*L/2 used by the modem.
    L = 2
    half = M * L // 2
    bins = np.concatenate([np.arange(half), np.arange(-half, 0)])
    vectors["rc_spectrum_sparse"] = {
        "overlap": L,
        "bins": bins.tolist(),
        "alphas": [0.2, 0.5],
        "values": {
            str(a): rc_spectrum(bins / M, a).tolist() for a in [0.2, 0.5]
        },
    }

    # --- Zadoff-Chu ---------------------------------------------------------
    # N=63/u in {25,29,34}: the LTE PSS roots (TS 36.211 6.11.1.1); N=64/u=5:
    # an even-length case exercising cf = 0.
    vectors["zadoff_chu"] = []
    for N_zc, u in [(63, 25), (63, 29), (63, 34), (64, 5), (127, 1)]:
        z = zadoff_chu(N_zc, u)
        vectors["zadoff_chu"].append({
            "N": N_zc, "u": u,
            "first8": c2l(z[:8]),
            "probe": {str(i): [z[i].real, z[i].imag]
                      for i in [N_zc // 2, N_zc - 1]},
        })

    # --- GFDM modulation matrix (Michailow 2014 eq. (5)) --------------------
    # Small M=2, K=4 case with a simple centered pulse; the matrix below is
    # hand-computable: col(k, m)[n] = g[(n - 2m) mod 8] * exp(j 2 pi k n / 4).
    g = np.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5])
    Nn = 8
    A = np.zeros((Nn, Nn), dtype=np.complex128)
    nn = np.arange(Nn)
    for k in range(4):
        for m in range(2):
            col = np.roll(g, m * 4) * np.exp(2j * np.pi * k * nn / 4.0)
            A[:, k * 2 + m] = col  # subcarrier-major (k*M + m)
    vectors["modulation_matrix_2x4"] = {
        "timeslots": 2, "subcarriers": 4,
        "pulse_centered": g.tolist(),   # g AFTER centering (no further roll)
        "columns_subcarrier_major": c2l(A.T),  # row i = column i of A
    }

    out = Path(__file__).parent / "cross_validation.json"
    out.write_text(json.dumps(vectors, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
