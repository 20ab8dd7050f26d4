"""Batched Viterbi decoder throughput on the chip (verdict round-4 item 1).

Two decoders over the same LLR batch at the canonical burst size (462 info
bits, 936 coded bits):
- full: one lax.scan over all 468 trellis steps - sequential in time,
  vectorized over states x bursts. Measured round-4: ~110 us/trellis-step
  latency bounds it at ~78 kbursts/s regardless of batch.
- windowed: block-parallel decoding (coding.WINDOW_BODY/OVERLAP) - the
  trellis splits into overlapping 128-step windows folded into the batch
  axis, so the scan is 128 steps however long the burst.

Also reports the coded-service ceiling: bursts/s through detect + extract +
fused receive + LLRs + Viterbi, estimated as the harmonic combination of the
measured uncoded service rate and the decoder rate.

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
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]

    rates = {}
    for mode in ("sm", "radix", "windowed", "full"):
        step = jax.jit(lambda x, s, m=mode: viterbi_decode(x * s, n_info, mode=m))
        out = step(dev, scales[-1])
        ber = float(np.mean(np.asarray(out) != bits))
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(dev, scales[i])
        np.asarray(out[:1, :1])  # fetch forces the queue
        dt = (time.perf_counter() - t0) / iters
        rates[mode] = batch / dt
        print(f"{mode:>9}: {dt*1e3:8.2f} ms  {batch/dt/1e3:8.1f} kbursts/s  "
              f"{batch*n_info/dt/1e6:8.1f} Minfobits/s  BER {ber:.2e}",
              flush=True)
    print(f"vs full: sm {rates['sm']/rates['full']:.2f}x  "
          f"radix {rates['radix']/rates['full']:.2f}x  "
          f"windowed {rates['windowed']/rates['full']:.2f}x", flush=True)
    # coded-service ceiling: uncoded service rate (docs/STATUS round-4:
    # ~448 kbursts/s device-step) in series with the decoder
    svc = 448e3
    best = max(rates, key=rates.get)
    coded = 1.0 / (1.0 / svc + 1.0 / rates[best])
    print(f"coded-service ceiling ({best}) vs uncoded {svc/1e3:.0f}k: "
          f"{coded/1e3:.1f} kbursts/s ({100*coded/svc:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
