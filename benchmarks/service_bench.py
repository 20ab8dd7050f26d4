"""Production receive-path benchmark: detect + extract + receive, staged.

Round-3 verdict item 1: the 4.4 Gs/s headline benches the sync-free loopback
link; the actual product - StreamingReceiver.step = planar detection (FFT
xcorr + moving-sum autocorr + per-chunk median noise floor) + dynamic-slice
extraction + fused one-kernel receiver - had no recorded throughput number.
This measures it on the real chip, input-varied and fetch-forced, and prices
each stage separately so the dominator is known, not guessed.

The priced path mirrors /root/reference/lib/extract_burst_cc_impl.cc:117-241
(tag-driven burst cutting) + hier_gfdm_receiver_tagged.grc (estimate ->
equalize -> IC demodulate), with detection replacing the external XFDMSync.

Usage: python -u benchmarks/service_bench.py [n_chunks] [iters]
Prints per-stage ms plus stream samples/s and bursts/s for the fused
service step (device-resident chunks, scalar-fetch forced), then the
host-loop service number (device_put + full host fetch included).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_chunks(cfg, n_chunks: int, chunk_len: int, halo: int, snr_db=20.0,
                seed=0):
    """(n_chunks, 2, chunk_len + halo) planar chunks, one burst per chunk."""
    from gfdm_tpu.ops.planar_pipeline import prepare, transmit_planar

    rng = np.random.default_rng(seed)
    qpsk = (rng.integers(0, 2, (n_chunks, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2.0)
    data = qpsk[:, 0] + 1j * qpsk[:, 1]
    prepare(cfg)
    # planar Tx on-device (the axon TPU cannot transfer complex dtypes)
    bursts = np.asarray(transmit_planar(cfg, qpsk.astype(np.float32))[:, 0])
    ext = chunk_len + halo
    sig_power = float(np.mean(np.sum(bursts**2, axis=1)))  # per complex sample
    noise_amp = np.sqrt(sig_power * 10 ** (-snr_db / 10) / 2)
    stream = noise_amp * rng.standard_normal((n_chunks, 2, ext))
    # burst start position varies per chunk inside the OWNED range: offsets
    # past chunk_len - cp_len put the xcorr peak beyond search_limit - in a
    # real stream those bursts belong to the next chunk (the round-4 "miss
    # tail" was exactly this synthetic-offset artifact; benchmarks/miss_tail.py)
    offs = rng.integers(0, chunk_len - cfg.cp_len, n_chunks)
    for i in range(n_chunks):
        stream[i, :, offs[i]: offs[i] + cfg.frame_len] += bursts[i]
    return stream.astype(np.float32), data, offs


def timed(fn, args, iters, scales, fetch):
    """Input-varied (scale per iter), fetch-forced mean seconds per call."""
    out = fn(*args, scales[-1])
    np.asarray(fetch(out))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, scales[i])
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gfdm_tpu import GfdmConfig
    from gfdm_tpu.ops import planar_pipeline as pp
    from gfdm_tpu.runtime.service import StreamingReceiver

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = GfdmConfig()
    chunk_len = 2048
    halo = cfg.frame_len + cfg.cp_len
    print(f"devices: {jax.devices()}  n_chunks={n_chunks} iters={iters}",
          flush=True)

    chunks_np, data, offs = make_chunks(cfg, n_chunks, chunk_len, halo)
    chunks = jax.device_put(chunks_np)
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]
    n_samples = n_chunks * chunk_len

    # --- stage 1: detection ---
    det_fn = jax.jit(lambda c, s: pp.detect_bursts_planar(
        cfg, c * s, search_limit=chunk_len))
    dt = timed(det_fn, (chunks,), iters, scales,
               lambda o: o["strength"].sum())
    print(f"stage detect:   {dt*1e3:8.2f} ms  ({n_samples/dt/1e9:.2f} Gs/s)",
          flush=True)

    det = {k: v for k, v in det_fn(chunks, scales[0]).items() if k != "ac_metric"}
    ok = np.abs(np.asarray(det["start"]) - (offs + cfg.cp_len)) <= 2
    print(f"  detection hits: {ok.mean()*100:.1f}%", flush=True)

    # --- stage 2: extraction ---
    ext_fn = jax.jit(lambda c, d, s: pp.extract_bursts_planar(cfg, c * s, d))
    dt = timed(ext_fn, (chunks, det), iters, scales, lambda o: o.sum())
    print(f"stage extract:  {dt*1e3:8.2f} ms  ({n_samples/dt/1e9:.2f} Gs/s)",
          flush=True)

    # --- stage 3: fused receiver on extracted bursts ---
    from gfdm_tpu.kernels import fused as fk
    bursts_dev = ext_fn(chunks, det, scales[0])

    def _rx(b, s):
        out = fk.receive_bursts_fused(cfg, b * s, ic_iterations=2, block=128)
        return out["data"], out["snr_lin"]

    rx_fn = jax.jit(_rx)
    dt = timed(rx_fn, (bursts_dev,), iters, scales, lambda o: o[1].sum())
    print(f"stage receive:  {dt*1e3:8.2f} ms  ({n_samples/dt/1e9:.2f} Gs/s)",
          flush=True)

    # --- full fused service step, device-resident, scalar-fetch forced ---
    rx = StreamingReceiver(cfg, chunk_len=chunk_len, batch_chunks=n_chunks,
                           engine="fused")
    step = jax.jit(lambda c, s: rx._step(c * s))
    dt = timed(step, (chunks,), iters, scales,
               lambda o: o["snr_lin"].sum() + o["data"].sum())
    sps = n_samples / dt
    print(f"full step:      {dt*1e3:8.2f} ms  stream {sps/1e9:.3f} Gs/s  "
          f"{n_chunks/dt/1e6:.2f} Mbursts/s", flush=True)

    out = step(chunks, scales[0])
    found = np.asarray(out["found"])
    dhat = np.asarray(out["data"])  # (slots, 2, n_data) planar
    d_c = dhat[:, 0] + 1j * dhat[:, 1]
    hard = (np.sign(d_c.real) + 1j * np.sign(d_c.imag)) / np.sqrt(2)
    ber_proxy = np.mean(hard != data)
    print(f"  found {found.mean()*100:.1f}%  sym err {ber_proxy*100:.3f}%",
          flush=True)

    # --- host service loop: device_put + full host fetch included ---
    def run_host(c):
        return rx.step(c)

    run_host(chunks_np)  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        run_host(chunks_np * np.float32(1.0 + 1e-6 * i))
    dt = (time.perf_counter() - t0) / iters
    print(f"host loop:      {dt*1e3:8.2f} ms  stream {n_samples/dt/1e9:.3f} "
          f"Gs/s (incl. device_put + host fetch)", flush=True)


if __name__ == "__main__":
    main()
