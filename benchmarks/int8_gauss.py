"""int8 Gauss-stack experiment (round-2 roadmap item 2 / VERDICT item 9).

Question: is an int8-quantized variant of the one-kernel link's operator
matmuls faster END TO END than f32, once the activation quantization that
int8 MXU issue requires sits on the critical path? (bf16 was already
measured slower end to end - cast overhead ate the 1.3x issue-rate gain.)

This benchmark isolates exactly the link's matmul chain shapes
(K=64, M=9, N=576: Tx core (2*468 -> 576), block DFT (1152 -> 576),
FD demod (1152 -> 576)) inside one Pallas kernel per dtype variant, with
fetch-forced timing and input variation, so the verdict bounds the full
link: if the chain is slower here, the link variant cannot win.

Run on the TPU:  python benchmarks/int8_gauss.py [batch] [iters]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _chain_f32(x_ref, w1_ref, w2_ref, w3_ref, o_ref):
    import jax.numpy as jnp

    a = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    b = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = jnp.dot(b, w3_ref[:], preferred_element_type=jnp.float32)


def _chain_bf16(x_ref, w1_ref, w2_ref, w3_ref, o_ref):
    import jax.numpy as jnp

    a = jnp.dot(x_ref[:].astype(jnp.bfloat16), w1_ref[:],
                preferred_element_type=jnp.float32)
    b = jnp.dot(a.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = jnp.dot(b.astype(jnp.bfloat16), w3_ref[:],
                       preferred_element_type=jnp.float32)


def _chain_int8(scales, x_ref, w1_ref, w2_ref, w3_ref, o_ref):
    import jax.numpy as jnp

    s1, s2, s3 = scales  # 1/(act_scale * weight_scale) per stage

    def qdot(x, w_ref, inv):
        # activation quantization ON the critical path: per-block absmax
        # scale, round, clip, cast - the cost the int8 issue rate must beat
        m = jnp.max(jnp.abs(x))
        s = 127.0 / jnp.maximum(m, 1e-20)
        xq = jnp.clip(jnp.round(x * s), -127, 127).astype(jnp.int8)
        acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (inv / s)

    a = qdot(x_ref[:], w1_ref, s1)
    b = qdot(a, w2_ref, s2)
    o_ref[:] = qdot(b, w3_ref, s3)


def build(variant, batch, block, shapes, weights):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (d_in, n1), (_, n2), (_, n3) = shapes
    if variant == "f32":
        kernel, ws = _chain_f32, [w.astype(np.float32) for w in weights]
    elif variant == "bf16":
        import jax.numpy as jnp  # noqa: F811

        kernel = _chain_bf16
        ws = [w.astype(jnp.bfloat16) for w in weights]
    else:
        wqs, invs = [], []
        for w in weights:
            sw = 127.0 / np.abs(w).max()
            wqs.append(np.clip(np.round(w * sw), -127, 127).astype(np.int8))
            invs.append(np.float32(1.0 / sw))
        kernel = functools.partial(_chain_int8, tuple(invs))
        ws = wqs
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n3), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[0].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[1].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[2].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    wdev = [jax.device_put(np.asarray(w)) for w in ws]
    return jax.jit(lambda x, s: call(x * s, *wdev))


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    block = 128

    # the one-kernel link's matmul chain shapes (K=64: N=576, n_data=468)
    rng = np.random.default_rng(0)
    shapes = [(936, 576), (1152, 576), (1152, 576)]
    # chain dims must connect: out n must equal next d_in/2... use flat 2N
    shapes = [(936, 1152), (1152, 1152), (1152, 1152)]
    weights = [rng.standard_normal(s).astype(np.float32) / np.sqrt(s[0])
               for s in shapes]
    x = rng.standard_normal((batch, 936)).astype(np.float32)
    xd = jax.device_put(x)
    scales = [jax.device_put(np.float32(1.0 + 1e-6 * i)) for i in range(iters)]

    flops = 2 * batch * sum(a * b for a, b in shapes)
    ref = None
    for variant in ("f32", "bf16", "int8"):
        try:
            fn = build(variant, batch, block, shapes, weights)
            out = fn(xd, scales[0])
            np.asarray(out[0, :1])  # compile + fetch
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(xd, scales[i])
            val = np.asarray(out[0, :1])  # fetch INSIDE the timed region
            dt = (time.perf_counter() - t0) / iters
            full = np.asarray(out)
            if variant == "f32":
                ref = full
                err = 0.0
            else:
                err = float(
                    np.abs(full - ref).max() / max(np.abs(ref).max(), 1e-9)
                )
            print(f"{variant:>5}: {dt*1e3:8.3f} ms  {flops/dt/1e12:6.2f} "
                  f"TF(OP)/s   rel-err {err:.2e}  probe {float(val[0]):+.3f}")
        except Exception as e:  # record compile failures honestly
            print(f"{variant:>5}: FAILED - {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
