"""Lightweight timing/profiling harness for jitted pipeline stages.

The reference has no tracing/profiling subsystem (SURVEY.md section 5.1 -
only commented-out chrono remnants); this provides the TPU-era equivalent:
wall-clock stage timing with fetch-forced device synchronization, derived
throughput metrics, and optional XLA profiler traces.

Fencing note: on tunneled backends ``jax.block_until_ready`` returns once
dispatch is acknowledged, NOT once execution finished (measured: a 5 ms
kernel reads as 0.05 ms) — so every timer here forces completion by fetching
one element of each result leaf to the host, which drains the serial queue.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np

__all__ = ["StageTimer", "force", "trace_to"]


def force(result) -> None:
    """Force execution AND completion of every array in ``result``.

    Fetches a single element per leaf (a scalar host transfer), which cannot
    complete until the computation producing the leaf has executed — the
    reliable fence on backends where block_until_ready only confirms
    dispatch. Cheap: one element per leaf, not the whole buffer.
    """
    for leaf in jax.tree_util.tree_leaves(result):
        if isinstance(leaf, jax.Array):
            if leaf.ndim:
                np.asarray(leaf[(0,) * leaf.ndim])
            else:
                np.asarray(leaf)


class _StageResult:
    """Mutable holder the ``stage()`` context yields; assign ``.value``."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = None


@dataclass
class StageTimer:
    """Accumulates per-stage wall-clock with fetch-forced fencing.

    Usage:
        timer = StageTimer()
        with timer.stage("tx") as s:
            s.value = tx_step(data)   # assign so the fence sees the result
        print(timer.report(samples_per_call={"tx": batch * frame_len}))

    If ``s.value`` is left unassigned the stage measures dispatch time only
    (a warning is recorded in ``unfenced``).
    """

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)
    unfenced: set = field(default_factory=set)

    @contextlib.contextmanager
    def stage(self, name: str):
        holder = _StageResult()
        t0 = time.perf_counter()
        yield holder
        if holder.value is not None:
            force(holder.value)
        else:
            self.unfenced.add(name)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def timeit(self, name: str, fn, *args, iters: int = 5, warmup: int = 1):
        """Time a jitted callable, fetch-forced; returns secs/call.

        Caveat: identical dispatches can be served from a result cache on
        some stacks; pass a fresh-args callable (e.g. close over an iterator)
        if ``fn(*args)`` is bitwise-identical across calls and you see
        implausibly fast times.
        """
        out = None
        for _ in range(warmup):
            out = fn(*args)
        force(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force(out)  # inside the timed region: drains the serial queue
        dt = (time.perf_counter() - t0) / iters
        self.times[name] = self.times.get(name, 0.0) + dt * iters
        self.counts[name] = self.counts.get(name, 0) + iters
        return dt

    def report(self, samples_per_call: dict | None = None) -> str:
        lines = [f"{'stage':<24}{'calls':>7}{'ms/call':>10}{'Msamp/s':>10}"]
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            per = total / n
            thr = ""
            if samples_per_call and name in samples_per_call:
                thr = f"{samples_per_call[name] / per / 1e6:10.1f}"
            mark = " (dispatch only)" if name in self.unfenced else ""
            lines.append(f"{name:<24}{n:>7}{per * 1e3:>10.3f}{thr:>10}{mark}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """XLA profiler trace (view with tensorboard/xprof), best-effort."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
