"""Multi-HOST streaming-receive proof: >=2 OS processes, jax.distributed.

The reference has no distributed layer at all (SURVEY.md section 5.8); the
BASELINE.md north star demands >=80% scaling efficiency to N>=2 hosts. The
framework's multi-host design (gfdm_tpu.runtime.service docstring): chunk
batches are assigned to hosts in contiguous time ranges (host_chunk_range),
each host serves its range on its LOCAL device mesh, and steady-state
reception needs NO cross-host collectives - DCN carries only control traffic
and aggregated metrics.

This module proves that design end to end on one machine:

  - worker (``python -m gfdm_tpu.parallel.multihost --process-id I ...``):
    joins a jax.distributed runtime (CPU backend, Gloo collectives), builds
    the SAME deterministic burst stream as every other process, serves its
    host_chunk_range through a StreamingReceiver on its local mesh, then
    psums the per-host stats over the GLOBAL device mesh (the one real
    cross-host collective) and writes its payloads + timings to disk.

  - ``launch(num_processes, ...)``: parent helper spawning the workers on a
    local coordinator, plus a 1-process baseline, returning payload-parity
    and scaling-efficiency results.

On real multi-host TPU pods the same worker code runs unchanged with
jax.distributed.initialize() picking up the cluster environment
(runtime.service.init_distributed).
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

__all__ = ["launch", "worker_main", "build_stream_chunks"]

_CHUNK_LEN = 2048


def build_stream_chunks(cfg, n_chunks: int, seed: int = 9):
    """Deterministic halo-extended chunk batch shared by every process.

    One burst in each chunk except every 5th (kept empty so the CFAR
    rejection path is exercised too). Returns (chunks (n,2,ext) float32,
    expected payload planar array, expected found mask).
    """
    from ..ops import planar as pl
    from ..ops import tx as tx_ops
    from ..ref import utils

    halo = cfg.frame_len + cfg.cp_len
    rng = np.random.default_rng(seed)
    data = np.stack([
        utils.random_qpsk(cfg.n_data_symbols, seed=seed + 100 + i)
        for i in range(n_chunks)
    ]).astype(np.complex64)
    bursts = np.asarray(tx_ops.transmit(cfg, data))[:, 0, :]

    stream = 0.01 * (
        rng.standard_normal(n_chunks * _CHUNK_LEN)
        + 1j * rng.standard_normal(n_chunks * _CHUNK_LEN)
    ).astype(np.complex64)
    expect_found = np.ones(n_chunks, dtype=bool)
    for i in range(n_chunks):
        if i % 5 == 4:
            expect_found[i] = False
            continue
        off = i * _CHUNK_LEN + 97 + (i * 131) % 600
        stream[off : off + cfg.frame_len] += bursts[i]

    planar = pl.to_planar(stream)
    from ..runtime.stream import chunk_with_lookahead

    chunks = np.moveaxis(
        np.asarray(chunk_with_lookahead(planar, _CHUNK_LEN, halo)), -2, -3
    ).astype(np.float32)
    return chunks, pl.to_planar(data).astype(np.float32), expect_found


def _serve_range(cfg, chunks, lo: int, hi: int, batch_chunks: int):
    """Serve chunks[lo:hi] through a local-mesh StreamingReceiver.

    Returns (per-slot host outputs dict, wall seconds excluding compile).
    """
    import jax

    from ..runtime.service import ServiceStats, StreamingReceiver

    devs = np.asarray(jax.local_devices())
    mesh = jax.sharding.Mesh(devs.reshape(len(devs), 1), ("dp", "sp"))
    rx = StreamingReceiver(cfg, chunk_len=_CHUNK_LEN,
                           batch_chunks=max(batch_chunks, len(devs)),
                           mesh=mesh)
    rx.step(chunks[lo : lo + rx.batch_chunks])  # compile warmup
    rx.stats = ServiceStats()  # warmup must not count toward global metrics

    got = []
    idx = lo

    def source():
        nonlocal idx
        if idx >= hi:
            return None
        batch = chunks[idx : min(idx + rx.batch_chunks, hi)]
        base = idx * _CHUNK_LEN
        idx += batch.shape[0]
        return batch, base

    t0 = time.perf_counter()
    rx.serve(source, sink=got.append)
    dt = time.perf_counter() - t0

    out = {
        "found": np.concatenate([g["found"] for g in got]),
        "data": np.concatenate([g["data"] for g in got]),
        "start_abs": np.concatenate([g["start_abs"] for g in got]),
        "snr_lin": np.concatenate([g["snr_lin"] for g in got]),
    }
    return out, dt, rx.stats


def worker_main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-chunks", type=int, default=24)
    p.add_argument("--batch-chunks", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    # CPU backend BEFORE any device query (env JAX_PLATFORMS does not
    # override this image's sitecustomize; the config call does)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..config import GfdmConfig
    from ..runtime.service import host_chunk_range

    cfg = GfdmConfig()
    chunks, _, _ = build_stream_chunks(cfg, args.n_chunks)
    r = host_chunk_range(args.n_chunks, args.num_processes, args.process_id)
    out, dt, stats = _serve_range(cfg, chunks, r.start, r.stop,
                                  args.batch_chunks)

    # the one real cross-host exchange: psum the per-host metrics over the
    # GLOBAL mesh (Gloo over the coordinator's network on CPU; ICI/DCN
    # collectives on TPU pods)
    gmesh = Mesh(np.asarray(jax.devices()), ("hosts",))
    n_local = jax.local_device_count()
    local_counts = np.tile(
        np.asarray(
            [[float(out["found"].sum()), float(stats.chunks),
              float(stats.samples)]], dtype=np.float32,
        ) / n_local,
        (n_local, 1),
    )
    arr = jax.make_array_from_process_local_data(
        NamedSharding(gmesh, P("hosts")), local_counts,
        (args.num_processes * n_local, 3),
    )
    totals = np.asarray(
        jax.jit(
            lambda x: jnp.sum(x, axis=0),
            out_shardings=NamedSharding(gmesh, P()),
        )(arr)
    )

    os.makedirs(args.out_dir, exist_ok=True)
    np.savez(
        os.path.join(args.out_dir, f"proc{args.process_id}.npz"),
        found=out["found"], data=out["data"], start_abs=out["start_abs"],
        snr_lin=out["snr_lin"], serve_seconds=dt,
        chunk_lo=r.start, chunk_hi=r.stop,
        global_bursts=totals[0], global_chunks=totals[1],
        global_samples=totals[2],
        process_count=jax.process_count(),
    )
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(num_processes: int = 2, n_chunks: int = 24, out_dir: str | None = None,
           timeout: float = 600.0, local_devices_per_process: int = 2) -> dict:
    """Spawn a multi-process run + a 1-process baseline; verify and time.

    Returns {"parity": bool, "efficiency": float, "totals": ..., ...}.
    Raises on worker failure or timeout.
    """
    import tempfile

    own_dir = out_dir is None
    if own_dir:
        out_dir = tempfile.mkdtemp(prefix="gfdm_multihost_")

    def run_group(n_procs, tag):
        port = _free_port()
        gdir = os.path.join(out_dir, tag)
        env = dict(os.environ)
        # replace (not append) any inherited device-count flag - e.g. the
        # test suite's 8-device mesh - so each worker gets exactly its own
        kept = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        kept.append(
            f"--xla_force_host_platform_device_count={local_devices_per_process}"
        )
        env["XLA_FLAGS"] = " ".join(kept)
        env.pop("JAX_PLATFORMS", None)
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "gfdm_tpu.parallel.multihost",
                 "--process-id", str(i), "--num-processes", str(n_procs),
                 "--coordinator", f"127.0.0.1:{port}",
                 "--out-dir", gdir, "--n-chunks", str(n_chunks)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            for i in range(n_procs)
        ]
        deadline = time.monotonic() + timeout
        for i, pr in enumerate(procs):
            remaining = max(1.0, deadline - time.monotonic())
            try:
                _, err = pr.communicate(timeout=remaining)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise TimeoutError(f"{tag} worker {i} timed out")
            if pr.returncode != 0:
                raise RuntimeError(
                    f"{tag} worker {i} failed rc={pr.returncode}:\n"
                    + err.decode(errors="replace")[-2000:]
                )
        return [
            np.load(os.path.join(gdir, f"proc{i}.npz")) for i in range(n_procs)
        ]

    multi = run_group(num_processes, f"n{num_processes}")
    base = run_group(1, "n1")[0]

    # --- payload parity: multi-host union == single-process run -----------
    # contiguous host ranges in process order ARE chunk order, slot for slot
    m_found = np.concatenate([m["found"] for m in multi])
    m_data = np.concatenate([m["data"] for m in multi])
    m_start = np.concatenate([m["start_abs"] for m in multi])
    parity = (
        bool((m_found == base["found"]).all())
        and bool((m_start[m_found] == base["start_abs"][base["found"]]).all())
        and bool(
            np.allclose(m_data[m_found], base["data"][base["found"]], atol=1e-5)
        )
    )

    # --- scaling efficiency of the collective-free serve ------------------
    t_multi = max(float(m["serve_seconds"]) for m in multi)
    t_base = float(base["serve_seconds"])
    efficiency = t_base / (num_processes * t_multi) if t_multi > 0 else 0.0

    # --- the cross-host psum agreed everywhere -----------------------------
    expect_bursts = int(base["found"].sum())
    psum_ok = all(
        int(m["global_bursts"]) == expect_bursts
        and int(m["global_chunks"]) == n_chunks
        and int(m["process_count"]) == num_processes
        for m in multi
    )

    result = {
        "num_processes": num_processes,
        "n_chunks": n_chunks,
        "parity": parity,
        "psum_ok": psum_ok,
        "bursts_found": expect_bursts,
        "serve_seconds_multi_max": t_multi,
        "serve_seconds_single": t_base,
        "efficiency": efficiency,
    }
    if own_dir:
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(result, f, indent=1)
        result["out_dir"] = out_dir
    return result


if __name__ == "__main__":
    sys.exit(worker_main())
