"""One-kernel link variants: qpsk / qam16 / qam64 headline + compile cost.

Round-3 verdict item 3: the qam64 variant was parity-tested but never
benchmarked - its block-256 compile blew a 10-minute window twice. This
script measures every constellation variant at the headline shape AND
reports each variant's compile wall time, so it doubles as the documented
cache pre-warm procedure: run it once after deployment (or after bumping
jax) and every variant's executable lands in the persistent compile cache
(gfdm_tpu/__init__ points XLA at ~/.cache/gfdm_tpu_xla); subsequent serve
or bench runs pay zero compile anywhere on the ladder.

Run on the TPU:  python -u benchmarks/link_variants.py [batch] [iters] [block]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from gfdm_tpu import GfdmConfig
    from gfdm_tpu.kernels.fused import link_single_fused
    from gfdm_tpu.ops.planar_pipeline import prepare

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 -> auto (256)
    cfg = GfdmConfig()
    prepare(cfg)
    print(f"devices: {jax.devices()}  batch={batch} block={block or 'auto'}",
          flush=True)

    rng = np.random.default_rng(0)
    qpsk = (rng.integers(0, 2, (batch, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2.0)
    data = jax.device_put(qpsk.astype(np.float32))
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]

    for constellation in ("qpsk", "qam16", "qam64"):
        step = jax.jit(
            lambda d, s, c=constellation: link_single_fused(
                cfg, d * s, ic_iterations=2, block=(block or None),
                ic_mode="matmul", constellation=c,
            )
        )
        t0 = time.perf_counter()
        out = step(data, scales[-1])
        evm = float(np.asarray(out[2]))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(data, scales[i])
        float(np.asarray(out[2]))
        dt = (time.perf_counter() - t0) / iters
        sps = batch * cfg.frame_len / dt
        print(f"{constellation:6s}: {dt*1e3:7.2f} ms  {sps/1e9:5.2f} Gs/s  "
              f"EVM {evm:.4f}  (compile+warmup {t_compile:.1f} s)", flush=True)
        # note: EVM compares the IC-refined symbols against the QPSK input
        # payload; the quantizer constellation only changes the IC decision
        # grid, so throughput is the comparison that matters here


if __name__ == "__main__":
    main()
