"""Speed-of-light / MFU accounting for the one-kernel link (verdict item 2).

Round 2 published "~20-25 TFLOP/s ceiling"; round 3's int8_gauss measured
54.1 TF/s on the link-shaped matmul chain. Both were SHAPE POINTS, not chip
ceilings - this benchmark separates the three quantities the MFU claim
needs:

  1. peak dense f32/bf16 matmul rate at large square shapes (the practical
     MXU ceiling on this chip),
  2. the link-shaped Gauss-chain rate (same matmul sizes as the one-kernel
     link, block 128/256 - what the link's matmuls can at best sustain),
  3. the link's actual matmul FLOPs per burst (counted from the kernel's
     operator shapes) divided by the measured headline step time.

MFU(headline) = 3 / 1;  chain efficiency = 3 / 2.

Run on the TPU:  python -u benchmarks/speed_of_light.py [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _timed(fn, args_list, fetch):
    out = fn(*args_list[-1])
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / len(args_list)


def peak_matmul(iters=10):
    """Practical MXU ceiling: big square matmul, f32 and bf16."""
    import jax
    import jax.numpy as jnp

    res = {}
    B, N = 8192, 4096
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jax.device_put(
            np.random.default_rng(0).standard_normal((B, N)).astype(np.float32)
        ).astype(dt)
        w = jax.device_put(
            np.random.default_rng(1).standard_normal((N, N)).astype(np.float32)
        ).astype(dt)
        f = jax.jit(lambda x, w, s: jnp.dot(
            x * s, w, preferred_element_type=jnp.float32))
        scales = [jax.device_put(np.asarray(1.0 + 1e-6 * i, x.dtype))
                  for i in range(iters)]
        dtm = _timed(f, [(x, w, s) for s in scales], lambda o: o[0, 0])
        tf = 2 * B * N * N / dtm / 1e12
        res[name] = tf
        print(f"peak {name} ({B}x{N})@({N}x{N}): {dtm*1e3:7.2f} ms  "
              f"{tf:6.1f} TF/s", flush=True)
    return res


def link_flop_table(cfg):
    """Per-matmul MXU MACs of the one-kernel link (canonical shapes)."""
    from gfdm_tpu.kernels.fused import _met_layout

    n = cfg.block_len
    n_d = cfg.n_data_symbols
    half = 2 * cfg.subcarriers
    n_cnr, _ = _met_layout(cfg)
    rows = [
        # (stage, gauss n_in, n_out, dtype, count)
        ("tx core (map+mod, T_G)", n_d, n, "f32", 1),
        ("channel est (E_G)", half, n, "f32", 1),
        ("snr half-spectrum (F2_G)", half, half, "f32", 1),
        ("metric selection (sel)", None, None, "f32", 1),
        ("block FFT (F_G)", n, n, "f32", 1),
        ("fd demod (Bfd_G)", n, n, "f32", 1),
        ("ic matmul x2 (icop, bf16)", n, n, "bf16", 2),
        ("demap selection (dsel)", None, None, "f32", 1),
    ]
    macs = {}
    total_f32 = total_bf16 = 0
    for stage, nin, nout, dt, cnt in rows:
        if stage.startswith("metric"):
            m = half * (2 + n_cnr)
        elif stage.startswith("demap"):
            m = 2 * n * n_d
        else:
            m = 3 * nin * nout  # Gauss triple
        m *= cnt
        macs[stage] = (m, dt)
        if dt == "f32":
            total_f32 += m
        else:
            total_bf16 += m
    return macs, total_f32, total_bf16


def main():
    import jax

    from gfdm_tpu import GfdmConfig

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"devices: {jax.devices()}", flush=True)
    cfg = GfdmConfig()

    macs, f32_macs, bf16_macs = link_flop_table(cfg)
    print("\nper-burst link matmul table (MACs, Gauss form):")
    for k, (m, dt) in macs.items():
        print(f"  {k:32s} {m:10,d}  {dt}")
    print(f"  total f32  {f32_macs:10,d} MACs = {2*f32_macs/1e6:.2f} MFLOP")
    print(f"  total bf16 {bf16_macs:10,d} MACs = {2*bf16_macs/1e6:.2f} MFLOP",
          flush=True)

    peaks = peak_matmul(iters)

    # headline link rate: run the production bench step once here
    import jax.numpy as jnp

    from gfdm_tpu.kernels.fused import link_single_fused
    from gfdm_tpu.ops.planar_pipeline import prepare

    prepare(cfg)
    batch = 262144
    rng = np.random.default_rng(0)
    qpsk = (rng.integers(0, 2, (batch, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2.0)
    data = jax.device_put(qpsk.astype(np.float32))
    step = jax.jit(lambda d, s: link_single_fused(
        cfg, d * s, ic_iterations=2, block=None, ic_mode="matmul"))
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]
    dt = _timed(step, [(data, s) for s in scales], lambda o: o[2])
    bursts_s = batch / dt
    f32_rate = 2 * f32_macs * bursts_s / 1e12
    bf16_rate = 2 * bf16_macs * bursts_s / 1e12
    # bf16 issue runs ~peak_bf16/peak_f32 faster; fold into f32-equivalents
    eq = f32_rate + bf16_rate * peaks["f32"] / peaks["bf16"]
    print(f"\nlink @ {batch}: {dt*1e3:.2f} ms = {bursts_s/1e6:.2f} Mbursts/s "
          f"({bursts_s*cfg.frame_len/1e9:.2f} Gsamples/s)")
    print(f"  matmul throughput: {f32_rate:.1f} TF/s f32 + {bf16_rate:.1f} "
          f"TOP/s bf16 = {eq:.1f} TF/s f32-equivalent")
    print(f"  MFU vs peak f32 ceiling ({peaks['f32']:.1f} TF/s): "
          f"{100*eq/peaks['f32']:.0f}%", flush=True)


if __name__ == "__main__":
    main()
