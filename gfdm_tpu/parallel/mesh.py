"""Device-mesh parallelism for burst streams.

The reference's parallelism is a thread-per-block GNU Radio scheduler inside
one process (SURVEY.md section 2.6); frames are embarrassingly parallel
(/root/reference/lib/transmitter_cc_impl.cc:165-177). The TPU-native mapping:

  - 'dp' axis: bursts/frames sharded across chips (the throughput axis).
    Pure data parallelism - zero communication in steady state.
  - 'sp' axis: long IQ streams split into frame-aligned chunks across chips.
    The only cross-chunk coupling is a burst window straddling a boundary,
    which is a fixed-width halo: each chip pulls the head of its right
    neighbour's chunk via jax.lax.ppermute before synchronization
    (the SP analogue demanded by BASELINE.json; cf. the reference's
    partial-burst deferral, extract_burst_cc_impl.cc:214-228).
  - metrics (error counts, EVM accumulators) aggregate with psum.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GfdmConfig
from ..ops import burst as burst_ops
from ..ops import sync as sync_ops

__all__ = [
    "make_mesh",
    "shard_bursts",
    "halo_exchange_right",
    "detect_bursts_sharded",
    "psum_metrics",
]


def make_mesh(devices=None, dp: int | None = None, sp: int = 1) -> Mesh:
    """Mesh over the available devices with ('dp', 'sp') axes."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def shard_bursts(mesh: Mesh, array, batch_axis: int = 0):
    """Place a burst-batched array with the batch axis sharded over 'dp'."""
    spec = [None] * array.ndim
    spec[batch_axis] = "dp"
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def halo_exchange_right(chunks, halo: int, axis_name: str = "sp"):
    """Append the first ``halo`` samples of the right neighbour's chunk.

    To be called inside shard_map with the last axis sharded over
    ``axis_name``. The last shard in the ring receives the first shard's
    head; its detections there are discarded by the ownership mask.

    (..., T_local) -> (..., T_local + halo)
    """
    n = jax.lax.psum(1, axis_name)
    head = chunks[..., :halo]
    # left neighbour (i-1) receives our head: our right halo comes FROM i+1
    recv = jax.lax.ppermute(head, axis_name, [(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([chunks, recv], axis=-1)


def detect_bursts_sharded(
    cfg: GfdmConfig,
    mesh: Mesh,
    stream,
    halo: int | None = None,
    planar: bool = False,
    false_alarm_prob: float = 1e-5,
):
    """Burst detection over a stream whose sample axis is sharded on 'sp'.

    ``stream``: (batch, n_sp * chunk_len) complex - or, with ``planar=True``,
    (batch, 2, n_sp * chunk_len) real planes (the TPU path) - with batch
    sharded on 'dp' and the sample axis sharded on 'sp'. Each chip extends
    its chunk with a frame-length halo from the right neighbour and searches
    the WHOLE extended window (owned region + halo), so a burst near a chunk
    boundary is typically seen twice: by its owner (start < chunk_len) and by
    the left neighbour inside its halo (start >= chunk_len). The ``owned``
    mask discriminates the two - exactly one shard keeps each burst (the
    sharded analogue of the reference's partial-burst deferral,
    /root/reference/lib/extract_burst_cc_impl.cc:214-228).

    Per shard, TWO detection picks are taken (peak suppression one frame
    apart) and the primary is chosen as: strongest CFAR-valid OWNED pick,
    else strongest CFAR-valid pick, else the raw argmax - so a neighbour's
    strong burst sitting in the halo cannot shadow a weaker owned burst.

    Returns (detection dict incl. ``owned``/``found``, extracted bursts) with
    per-chip leading layout re-assembled to (batch, n_sp, ...).
    """
    if halo is None:
        halo = cfg.padded_frame_len

    n_sp = mesh.shape["sp"]
    total = stream.shape[-1]
    chunk_len = total // n_sp

    if planar:
        from ..ops import planar_pipeline as pp

        in_spec = P("dp", None, "sp")
        burst_spec = P("dp", "sp", None, None)
        detect_topk = pp.detect_bursts_topk_planar
        extract = pp.extract_bursts_planar
    else:
        in_spec = P("dp", "sp")
        burst_spec = P("dp", "sp", None)
        detect_topk = sync_ops.detect_bursts_topk
        extract = burst_ops.extract_bursts

    det_keys = ("start", "cfo", "scale", "strength", "ac_peak",
                "noise_floor", "owned", "found")

    @jax.jit  # keep shard_map traced: the eager path cannot re-enter jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_spec,
        out_specs=(
            {k: P("dp", "sp") for k in det_keys},
            burst_spec,
        ),
    )
    def _shard_fn(local):
        # local: (batch/dp, chunk_len) or (batch/dp, 2, chunk_len)
        extended = halo_exchange_right(local, halo, "sp")
        det2 = detect_topk(cfg, extended, max_bursts=2)  # full-window search
        owned2 = det2["start"] < chunk_len
        valid2 = sync_ops.detection_valid(det2, false_alarm_prob)
        # rank: valid & owned > valid > raw strength (strengths are O(1))
        score = det2["strength"] + 1e6 * (valid2 & owned2) + 1e3 * valid2
        best = jnp.argmax(score, axis=-1)
        det = {
            k: jnp.take_along_axis(det2[k], best[..., None], axis=-1)[..., 0]
            for k in ("start", "cfo", "scale", "strength", "ac_peak")
        }
        det["noise_floor"] = det2["noise_floor"]
        det["owned"] = det["start"] < chunk_len
        det["found"] = det["owned"] & jnp.take_along_axis(
            valid2, best[..., None], axis=-1
        )[..., 0]
        bursts = extract(cfg, extended, det)
        out_det = {k: det[k][..., None] for k in det_keys}
        if planar:
            bursts = bursts[:, None, :, :]  # (b, 1, 2, L)
        else:
            bursts = bursts[..., None, :]  # (b, 1, L)
        return out_det, bursts

    det, bursts = _shard_fn(stream)
    det = {k: v.reshape(v.shape[0], n_sp) for k, v in det.items()}
    if planar:
        bursts = bursts.reshape(bursts.shape[0], n_sp, 2, -1)
    else:
        bursts = bursts.reshape(bursts.shape[0], n_sp, -1)
    return det, bursts


def psum_metrics(metrics: dict, axis_name: str):
    """Sum metric accumulators across an axis (inside shard_map/pjit)."""
    return {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}
