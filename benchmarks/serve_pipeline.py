"""serve() pipeline-depth study: double buffering vs single-deep (item 4).

Measures the persistent receive loop's wall-clock per chunk at small batch
sizes, depth 1 (round-3 behavior) vs depth 2 (double buffering): with two
batches in flight the host-side fetch + next dispatch overlap the device
compute, hiding the per-dispatch tunnel latency (~3.5 ms) that dominates
small batches. Source = prebuilt burst-bearing chunk pool, sink = drop.

Run on the TPU:  python -u benchmarks/serve_pipeline.py [n_batches]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax  # noqa: F401

    from benchmarks.service_bench import make_chunks
    from gfdm_tpu import GfdmConfig
    from gfdm_tpu.runtime.service import StreamingReceiver

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = GfdmConfig()
    chunk_len = 2048
    halo = cfg.frame_len + cfg.cp_len
    pool, _, _ = make_chunks(cfg, 1024, chunk_len, halo)

    print(f"{'batch':>6} {'depth':>6} {'ms/batch':>9} {'Msamples/s':>11}")
    for batch in (64, 256, 1024):
        for depth in (1, 2):
            rx = StreamingReceiver(cfg, chunk_len=chunk_len,
                                   batch_chunks=batch, engine="fused",
                                   pipeline_depth=depth)
            batches = [
                np.ascontiguousarray(
                    pool[(i * batch) % 1024 : (i * batch) % 1024 + batch]
                    * np.float32(1.0 + 1e-6 * i)
                )
                for i in range(n_batches)
            ]
            it = iter(batches)
            rx.serve(lambda: next(it, None), lambda out: None,
                     max_batches=2)  # warm both ladder + transfer paths
            it = iter(batches)
            t0 = time.perf_counter()
            rx.serve(lambda: next(it, None), lambda out: None)
            dt = (time.perf_counter() - t0) / len(batches)
            sps = batch * chunk_len / dt
            print(f"{batch:6d} {depth:6d} {dt*1e3:9.2f} {sps/1e6:11.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
