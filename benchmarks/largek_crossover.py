"""Large-K receiver crossover study: fused-factored Pallas vs XLA 'fast'.

At K >= 256 no dense (2N, 2N) or (4K, 2N) operator fits VMEM, so the only
fused-kernel contender is rx_receiver_factored(estimator="fast") — channel
estimated by the O(K^2) factorized XLA stage, demod/IC by the Cooley-Tukey
roll kernel. The XLA contender is receive_bursts_planar(method="fast").

Run on the TPU:  python benchmarks/largek_crossover.py [K] [batch] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(fn, args_list):
    import jax

    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    # force a fetch so the axon tunnel cannot defer execution
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])
    return (time.perf_counter() - t0) / len(args_list)


def main():
    import jax
    import jax.numpy as jnp

    from gfdm_tpu import GfdmConfig
    from gfdm_tpu.kernels.fused import default_factored_block, rx_receiver_factored
    from gfdm_tpu.ops import planar as pl_ops
    from gfdm_tpu.ops.planar_pipeline import prepare, receive_bursts_planar
    from gfdm_tpu.ref import utils

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mode = sys.argv[4] if len(sys.argv) > 4 else "both"  # xla | pallas | both
    blk = int(sys.argv[5]) if len(sys.argv) > 5 else 0  # 0 -> measured default

    cfg = GfdmConfig(
        subcarriers=K,
        active_subcarriers=int(K * 0.78125),  # 52/64 ratio of the canonical cfg
        timeslots=9,
        cp_len=K // 4,
        cs_len=K // 8,
    )
    print(f"K={K} M=9 active={cfg.active_subcarriers} frame_len={cfg.frame_len} "
          f"batch={batch}", file=sys.stderr)

    d = utils.random_qpsk(batch * cfg.n_data_symbols, seed=3)
    data = pl_ops.to_planar(d.reshape(batch, -1)).astype(np.float32)

    # build clean bursts once on device via the fast Tx path
    prepare(cfg, method="fast")
    from gfdm_tpu.ops.planar_pipeline import transmit_planar

    bursts = jax.jit(
        lambda x: transmit_planar(cfg, x, method="fast")
    )(jax.device_put(data))[:, 0]
    jax.block_until_ready(bursts)

    scales = [np.float32(1.0 + 1e-6 * i) for i in range(iters)]

    sps = batch * cfg.frame_len
    xla_fast = jax.jit(
        lambda b, s: receive_bursts_planar(cfg, b * s, ic_iterations=2,
                                           method="fast")["symbols"]
    )
    pallas_fast = jax.jit(
        lambda b, s: rx_receiver_factored(cfg, b * s, ic_iterations=2,
                                          block=min(blk or default_factored_block(cfg), batch),
                                          estimator="fast")[1]
    )

    if mode in ("xla", "both"):
        t_xla = bench(xla_fast, [(bursts, jax.device_put(s)) for s in scales])
        print(f"XLA fast:    {t_xla*1e3:8.2f} ms  {sps/t_xla/1e9:6.2f} Gsamples/s")
    if mode in ("pallas", "both"):
        t_pl = bench(pallas_fast, [(bursts, jax.device_put(s)) for s in scales])
        print(f"Pallas fast: {t_pl*1e3:8.2f} ms  {sps/t_pl/1e9:6.2f} Gsamples/s")
    if mode == "both":
        # correctness cross-check on this config
        a = np.asarray(xla_fast(bursts, jnp.float32(1.0)))
        b = np.asarray(pallas_fast(bursts, jnp.float32(1.0)))
        err = float(np.max(np.abs(a - b)))
        print(f"speedup {t_xla/t_pl:.2f}x   max|diff| {err:.2e}")

    if mode in ("link", "all"):
        # FULL payload->payload link (round-3 verdict item 5): factored Tx
        # kernel feeding the factored receiver vs the XLA fast Tx+Rx chain
        from gfdm_tpu.kernels.fused import tx_frame_factored
        from gfdm_tpu.ops.tx import demap_indices

        dmi = jnp.asarray(demap_indices(cfg))
        data_dev = jax.device_put(data)

        xla_link = jax.jit(
            lambda x, s: receive_bursts_planar(
                cfg,
                transmit_planar(cfg, x * s, method="fast")[:, 0],
                ic_iterations=2, method="fast",
            )["data"]
        )
        blk = min(blk or default_factored_block(cfg), batch)

        def _pl_link(x, s):
            b = tx_frame_factored(cfg, x * s, block=blk)
            _, sym = rx_receiver_factored(cfg, b, ic_iterations=2, block=blk,
                                          estimator="fast")
            return jnp.take(sym, dmi, axis=-1)

        pl_link = jax.jit(_pl_link)
        t_xl = bench(xla_link, [(data_dev, jax.device_put(s)) for s in scales])
        print(f"XLA link:    {t_xl*1e3:8.2f} ms  {sps/t_xl/1e9:6.2f} Gsamples/s")
        t_pll = bench(pl_link, [(data_dev, jax.device_put(s)) for s in scales])
        print(f"Pallas link: {t_pll*1e3:8.2f} ms  {sps/t_pll/1e9:6.2f} Gsamples/s")
        a = np.asarray(xla_link(data_dev, jnp.float32(1.0)))
        b = np.asarray(pl_link(data_dev, jnp.float32(1.0)))
        evm_a = float(np.sqrt(np.sum((a - data) ** 2) / np.sum(data**2)))
        evm_b = float(np.sqrt(np.sum((b - data) ** 2) / np.sum(data**2)))
        print(f"link speedup {t_xl/t_pll:.2f}x   EVM xla {evm_a:.4f} "
              f"pallas {evm_b:.4f}")


if __name__ == "__main__":
    main()
