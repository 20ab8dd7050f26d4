"""Continuous-stream processing: chunked burst reception on one device.

The GR scheduler feeds blocks overlapping stream windows; here a long IQ
recording is split into fixed chunks with a one-frame lookahead halo so every
burst is fully contained in exactly one extended chunk, then the batched
detector/receiver runs over all chunks at once (the intra-device counterpart
of the cross-device 'sp' sharding in gfdm_tpu.parallel.mesh; cf. the
reference's partial-burst deferral, extract_burst_cc_impl.cc:214-228).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from .receiver import receive_bursts

__all__ = [
    "chunk_with_lookahead",
    "receive_long_stream",
    "receive_chunks_planar",
    "receive_long_stream_planar",
]


def chunk_with_lookahead(stream, chunk_len: int, halo: int):
    """(..., T) -> (..., n_chunks, chunk_len + halo) with lookahead overlap.

    The tail chunk's halo is zero-padded (end of recording).
    """
    T = stream.shape[-1]
    n_chunks = T // chunk_len
    pad = jnp.zeros(stream.shape[:-1] + (halo,), dtype=stream.dtype)
    padded = jnp.concatenate([stream[..., : n_chunks * chunk_len], pad], axis=-1)
    idx = (
        jnp.arange(n_chunks)[:, None] * chunk_len + jnp.arange(chunk_len + halo)[None, :]
    )
    return padded[..., idx]


def _found_mask(det, chunk_len: int, min_strength, false_alarm_prob):
    """Ownership AND detection decision for per-slot outputs.

    Default rule: the constant-false-alarm-rate threshold derived from
    ``false_alarm_prob`` (ops.sync.detection_valid, mirroring the reference's
    threshold_factor derivation). ``min_strength`` (a raw gated-peak floor)
    overrides it when set - the legacy magic-constant behavior.
    """
    from ..ops import sync as sync_ops

    owned = det["start"] < chunk_len
    if min_strength is not None:
        return owned & (det["strength"] > min_strength)
    return owned & sync_ops.detection_valid(det, false_alarm_prob)


def _flatten_slots(det_k, keys=("start", "cfo", "scale", "strength", "ac_peak")):
    """(..., k)-slotted detection dict -> flat per-slot dict (+ noise floor)."""
    det = {key: det_k[key].reshape(-1) for key in keys}
    det["noise_floor"] = jnp.broadcast_to(
        det_k["noise_floor"][..., None], det_k["start"].shape
    ).reshape(-1)
    return det


def receive_long_stream(
    cfg: GfdmConfig,
    stream,
    chunk_len: int = 2048,
    ic_iterations: int = 2,
    min_strength: float | None = None,
    correct_cfo: bool = True,
    max_bursts_per_chunk: int = 1,
    false_alarm_prob: float = 1e-5,
):
    """Receive every burst in a long recording.

    Returns the per-slot receiver outputs plus a ``found`` mask. With
    ``max_bursts_per_chunk > 1`` each chunk contributes that many detection
    slots (iterative peak suppression, strongest first) so densely packed
    bursts - up to one per frame length - are all recovered.

    Detection decision: see :func:`_found_mask` (CFAR threshold from
    ``false_alarm_prob`` unless ``min_strength`` is set explicitly).
    """
    from ..ops import burst as burst_ops
    from ..ops import sync as sync_ops

    halo = cfg.frame_len + cfg.cp_len
    chunks = chunk_with_lookahead(jnp.asarray(stream), chunk_len, halo)
    if max_bursts_per_chunk <= 1:
        det = sync_ops.detect_bursts(cfg, chunks, search_limit=chunk_len)
        det = {k: v for k, v in det.items() if k != "ac_metric"}
        bursts = burst_ops.extract_bursts(cfg, chunks, det, correct_cfo=correct_cfo)
    else:
        k = int(max_bursts_per_chunk)
        det_k = sync_ops.detect_bursts_topk(
            cfg, chunks, max_bursts=k, search_limit=chunk_len
        )
        # flatten (n_chunks, k) slots -> one burst batch
        rep = jnp.broadcast_to(
            chunks[..., None, :], chunks.shape[:-1] + (k, chunks.shape[-1])
        )
        det = _flatten_slots(det_k)
        bursts = burst_ops.extract_bursts(
            cfg, rep.reshape((-1, chunks.shape[-1])), det, correct_cfo=correct_cfo
        )
    out = receive_bursts(cfg, bursts, ic_iterations=ic_iterations)
    out["detection"] = det
    out["found"] = _found_mask(det, chunk_len, min_strength, false_alarm_prob)
    return out


def receive_chunks_planar(
    cfg: GfdmConfig,
    chunks,
    chunk_len: int,
    ic_iterations: int = 2,
    min_strength: float | None = None,
    correct_cfo: bool = True,
    max_bursts_per_chunk: int = 1,
    dtype_name: str = "float32",
    method: str = "dense",
    equalizer: str = "zf",
    false_alarm_prob: float = 1e-5,
    constellation: str = "qpsk",
    detect_dtype_name: str | None = None,
    refine_cfo: bool = True,
):
    """Receive every burst in a batch of extended chunks.

    ``chunks``: (..., 2, chunk_len + halo) planar, halo-extended (as produced
    by :func:`chunk_with_lookahead` or the native StreamBuffer). Detection is
    restricted to owned positions (< chunk_len). This is the jittable core
    shared by :func:`receive_long_stream_planar` and the streaming service.
    Detection decision: see :func:`_found_mask`.

    ``detect_dtype_name`` sets the sync front end's dtype independently of
    the demodulator's (the production service runs bf16 detection + f32
    receive); defaults to ``dtype_name``.

    ``refine_cfo``: after the coarse (preamble K-lag) correction applied
    at extraction, re-estimate the residual CFO from the payload block's
    CP (N-lag, 9x finer; planar_pipeline.refine_cfo_planar) and derotate
    - the two-stage sync that cuts low-SNR frame losses.
    """
    from ..ops import planar_pipeline as pp

    dd = detect_dtype_name or dtype_name
    C = chunks.shape[-1]
    if max_bursts_per_chunk <= 1:
        det = pp.detect_bursts_planar(
            cfg, chunks, search_limit=chunk_len, dtype_name=dd
        )
        det = {k: v for k, v in det.items() if k != "ac_metric"}
        bursts = pp.extract_bursts_planar(cfg, chunks, det,
                                          correct_cfo=correct_cfo,
                                          dtype_name=dd)
    else:
        k = int(max_bursts_per_chunk)
        det_k = pp.detect_bursts_topk_planar(
            cfg, chunks, max_bursts=k, search_limit=chunk_len,
            dtype_name=dd,
        )
        rep = jnp.broadcast_to(
            chunks[..., None, :, :], chunks.shape[:-2] + (k, 2, C)
        )
        det = _flatten_slots(det_k)
        bursts = pp.extract_bursts_planar(
            cfg, rep.reshape((-1, 2, C)), det, correct_cfo=correct_cfo,
            dtype_name=dd,
        )
    if refine_cfo and correct_cfo:
        bursts, _ = pp.refine_cfo_planar(cfg, bursts)
    from ..ops.rx import constellation_points

    out = pp.receive_bursts_planar(
        cfg, bursts, ic_iterations=ic_iterations, dtype_name=dtype_name,
        method=method, equalizer=equalizer,
        constellation=constellation_points(constellation),
    )
    out["detection"] = det
    out["found"] = _found_mask(det, chunk_len, min_strength, false_alarm_prob)
    return out


def receive_long_stream_planar(
    cfg: GfdmConfig,
    stream,
    chunk_len: int = 2048,
    ic_iterations: int = 2,
    min_strength: float | None = None,
    correct_cfo: bool = True,
    max_bursts_per_chunk: int = 1,
    dtype_name: str = "float32",
    method: str = "dense",
    equalizer: str = "zf",
    false_alarm_prob: float = 1e-5,
    constellation: str = "qpsk",
):
    """Planar (TPU-production) counterpart of :func:`receive_long_stream`.

    ``stream``: (..., 2, T) planar IQ recording. Returns the per-slot planar
    receiver outputs plus detection metadata and a ``found`` mask, with slots
    flattened over (chunks, bursts-per-chunk).
    """
    halo = cfg.frame_len + cfg.cp_len
    chunks = chunk_with_lookahead(jnp.asarray(stream), chunk_len, halo)
    # (..., 2, n_chunks, C) -> (..., n_chunks, 2, C)
    chunks = jnp.moveaxis(chunks, -2, -3)
    return receive_chunks_planar(
        cfg, chunks, chunk_len,
        ic_iterations=ic_iterations,
        min_strength=min_strength,
        correct_cfo=correct_cfo,
        max_bursts_per_chunk=max_bursts_per_chunk,
        dtype_name=dtype_name,
        method=method,
        equalizer=equalizer,
        false_alarm_prob=false_alarm_prob,
        constellation=constellation,
    )
