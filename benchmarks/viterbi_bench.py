"""Batched Viterbi decoder throughput on the chip (round-5 roadmap item 3).

The decoder is a lax.scan over trellis steps carrying (B, 64) path metrics -
sequential in time, fully vectorized over states x bursts. This measures
decoded bursts/s and info bits/s at the canonical burst size (462 info bits,
936 coded bits) so the coded link's capacity ceiling is a number, not a
guess.

Run on the TPU:  python -u benchmarks/viterbi_bench.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from gfdm_tpu.coding import conv_encode, info_bits_for_block, viterbi_decode

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_coded = 936  # canonical: 2 bits/symbol * 468 data symbols
    n_info = info_bits_for_block(n_coded)
    print(f"devices: {jax.devices()}  batch={batch} n_info={n_info}",
          flush=True)

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (batch, n_info)).astype(np.uint8)
    llrs = (1.0 - 2.0 * conv_encode(bits).astype(np.float32)) * 4.0
    llrs += rng.normal(0.0, 1.2, llrs.shape).astype(np.float32)
    dev = jax.device_put(llrs)
    step = jax.jit(lambda x, s: viterbi_decode(x * s, n_info))
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]

    out = step(dev, scales[-1])
    ber = float(np.mean(np.asarray(out) != bits))
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(dev, scales[i])
    np.asarray(out[:1, :1])  # fetch forces the queue
    dt = (time.perf_counter() - t0) / iters
    print(f"decode: {dt*1e3:8.2f} ms  {batch/dt/1e3:8.1f} kbursts/s  "
          f"{batch*n_info/dt/1e6:8.1f} Minfobits/s  BER {ber:.2e}", flush=True)


if __name__ == "__main__":
    main()
