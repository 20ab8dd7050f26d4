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
    max_bursts_per_chunk: int = 1,
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

    Per shard, ``max_bursts_per_chunk + 1`` detection picks are taken
    (iterative peak suppression one frame apart - the extra pick absorbs a
    neighbour's boundary burst sitting in the halo) and the kept slots are
    ranked: strongest CFAR-valid OWNED picks, then CFAR-valid picks, then raw
    strength - so a neighbour's strong halo burst cannot shadow a weaker
    owned one, and densely packed owned bursts (up to one per frame length,
    the reference's several-tags-per-work-call case,
    /root/reference/lib/extract_burst_cc_impl.cc:131-149) all survive.

    Returns (detection dict incl. ``owned``/``found``, extracted bursts) with
    per-chip leading layout re-assembled to (batch, n_sp, ...) when
    ``max_bursts_per_chunk == 1`` (the legacy single-slot layout) or
    (batch, n_sp, k, ...) otherwise.
    """
    if halo is None:
        halo = cfg.padded_frame_len

    n_sp = mesh.shape["sp"]
    total = stream.shape[-1]
    chunk_len = total // n_sp
    k_slots = int(max_bursts_per_chunk)
    if k_slots < 1:
        raise ValueError("max_bursts_per_chunk must be >= 1")

    if planar:
        from ..ops import planar_pipeline as pp

        in_spec = P("dp", None, "sp")
        burst_spec = P("dp", "sp", None, None, None)
        detect_topk = pp.detect_bursts_topk_planar
        extract = pp.extract_bursts_planar
    else:
        in_spec = P("dp", "sp")
        burst_spec = P("dp", "sp", None, None)
        detect_topk = sync_ops.detect_bursts_topk
        extract = burst_ops.extract_bursts

    det_keys = ("start", "cfo", "scale", "strength", "ac_peak",
                "noise_floor", "owned", "found")
    val_keys = ("start", "cfo", "scale", "strength", "ac_peak")

    @jax.jit  # keep shard_map traced: the eager path cannot re-enter jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_spec,
        out_specs=(
            {k: P("dp", "sp", None) for k in det_keys},
            burst_spec,
        ),
    )
    def _shard_fn(local):
        # local: (batch/dp, chunk_len) or (batch/dp, 2, chunk_len)
        extended = halo_exchange_right(local, halo, "sp")
        det_all = detect_topk(cfg, extended, max_bursts=k_slots + 1)
        owned_all = det_all["start"] < chunk_len
        valid_all = sync_ops.detection_valid(det_all, false_alarm_prob)
        # rank: valid & owned > valid > raw strength (strengths are O(1))
        score = det_all["strength"] + 1e6 * (valid_all & owned_all) + 1e3 * valid_all
        order = jnp.argsort(-score, axis=-1)[..., :k_slots]
        det = {
            k: jnp.take_along_axis(det_all[k], order, axis=-1)
            for k in val_keys
        }
        det["noise_floor"] = jnp.broadcast_to(
            det_all["noise_floor"][..., None], det["start"].shape
        )
        det["owned"] = det["start"] < chunk_len
        det["found"] = det["owned"] & jnp.take_along_axis(
            valid_all, order, axis=-1
        )
        b_local = extended.shape[0]
        C = extended.shape[-1]
        flat = {k: det[k].reshape(-1) for k in val_keys}
        if planar:
            rep = jnp.broadcast_to(
                extended[:, None, :, :], (b_local, k_slots, 2, C)
            )
            bursts = extract(cfg, rep.reshape(-1, 2, C), flat)
            bursts = bursts.reshape(b_local, 1, k_slots, 2, -1)
        else:
            rep = jnp.broadcast_to(extended[:, None, :], (b_local, k_slots, C))
            bursts = extract(cfg, rep.reshape(-1, C), flat)
            bursts = bursts.reshape(b_local, 1, k_slots, -1)
        out_det = {k: det[k][:, None, :] for k in det_keys}
        return out_det, bursts

    det, bursts = _shard_fn(stream)
    if k_slots == 1:
        det = {k: v.reshape(v.shape[0], n_sp) for k, v in det.items()}
        if planar:
            bursts = bursts.reshape(bursts.shape[0], n_sp, 2, -1)
        else:
            bursts = bursts.reshape(bursts.shape[0], n_sp, -1)
    else:
        det = {k: v.reshape(v.shape[0], n_sp, k_slots) for k, v in det.items()}
        if planar:
            bursts = bursts.reshape(bursts.shape[0], n_sp, k_slots, 2, -1)
        else:
            bursts = bursts.reshape(bursts.shape[0], n_sp, k_slots, -1)
    return det, bursts


def psum_metrics(metrics: dict, axis_name: str):
    """Sum metric accumulators across an axis (inside shard_map/pjit)."""
    return {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}
