"""Explain the 20 dB detection-miss tail (verdict round-4 item 2).

Reproduces bench.py's service stream EXACTLY (same seed, one burst per chunk
at a uniform random offset, AWGN 20 dB), runs the planar detector, and
dissects every miss: where the argmax landed vs the true offset, the gated
peak vs the CFAR threshold, and the histogram of misses by burst offset -
separating "argmax found the burst but the CFAR said no" from "argmax landed
somewhere else entirely".

Runs on CPU (same code path as the chip).  python -u benchmarks/miss_tail.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gfdm_tpu import GfdmConfig
    from gfdm_tpu.ops import sync as sync_ops
    from gfdm_tpu.ops.planar_pipeline import (
        detect_bursts_planar,
        prepare,
        transmit_planar,
    )
    from gfdm_tpu.runtime.stream import _found_mask

    cfg = GfdmConfig()
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk_len = 2048
    snr_db = 20.0
    halo = cfg.frame_len + cfg.cp_len
    rng = np.random.default_rng(0)
    qpsk = (rng.integers(0, 2, (n_chunks, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2.0)
    prepare(cfg)
    bursts = np.asarray(transmit_planar(cfg, qpsk.astype(np.float32))[:, 0])
    ext = chunk_len + halo
    sig_power = float(np.mean(np.sum(bursts**2, axis=1)))
    noise_amp = np.sqrt(sig_power * 10 ** (-snr_db / 10) / 2)
    stream = noise_amp * rng.standard_normal((n_chunks, 2, ext))
    offs = rng.integers(0, chunk_len - 1, n_chunks)
    for i in range(n_chunks):
        stream[i, :, offs[i] : offs[i] + cfg.frame_len] += bursts[i]

    det = detect_bursts_planar(cfg, stream.astype(np.float32),
                               search_limit=chunk_len)
    found = np.asarray(_found_mask(det, chunk_len, None, 1e-5))
    start = np.asarray(det["start"])
    strength = np.asarray(det["strength"])
    floor = np.asarray(det["noise_floor"])
    thresh = np.asarray(sync_ops.detection_threshold(1e-5, floor))

    miss = ~found
    n_miss = int(miss.sum())
    print(f"chunks={n_chunks}  found={found.mean():.4f}  misses={n_miss}")
    if n_miss == 0:
        return

    # expected peak position: xcorr peak sits at the core-preamble start
    # (cp_len into the burst)
    expect = offs + cfg.cp_len
    err = start.astype(int) - expect
    mi = np.where(miss)[0]
    on_burst = np.abs(err[mi]) <= 4
    print(f"  argmax on the burst but CFAR rejected: {int(on_burst.sum())}")
    print(f"  argmax elsewhere (|err|>4):            {int((~on_burst).sum())}")

    print("\nper-miss dissection (first 40):")
    print(" chunk   off  expect  start    err  strength  thresh  floor   "
          "margin")
    for i in mi[:40]:
        print(f"{i:6d} {offs[i]:5d} {expect[i]:7d} {start[i]:6d} "
              f"{err[i]:6d}  {strength[i]:8.3f} {thresh[i]:7.3f} "
              f"{floor[i]:6.3f}  {strength[i]/max(thresh[i],1e-9):7.3f}")

    # offset histogram: is the tail structural in offset?
    edges = np.linspace(0, chunk_len, 17)
    h_miss, _ = np.histogram(offs[mi], bins=edges)
    h_all, _ = np.histogram(offs, bins=edges)
    print("\nmiss rate by burst offset (16 bins over [0, 2048)):")
    for j in range(16):
        bar = "#" * int(60 * h_miss[j] / max(1, h_miss.max()))
        print(f"  [{int(edges[j]):5d},{int(edges[j+1]):5d}) "
              f"{h_miss[j]:4d}/{h_all[j]:4d}  {bar}")

    # margin distribution of ALL hits vs misses near the threshold
    margin = strength / np.maximum(thresh, 1e-9)
    print(f"\nmargin (strength/threshold): hits p1={np.percentile(margin[found], 1):.3f} "
          f"median={np.median(margin[found]):.3f}; "
          f"misses max={margin[mi].max():.3f} median={np.median(margin[mi]):.3f}")
    # where do the wrong-argmax picks land?
    wrong = mi[~on_burst]
    if wrong.size:
        print("\nwrong-argmax picks: start positions", start[wrong][:20],
              "for offsets", offs[wrong][:20])


if __name__ == "__main__":
    main()
