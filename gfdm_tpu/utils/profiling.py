"""Lightweight timing/profiling harness for jitted pipeline stages.

The reference has no tracing/profiling subsystem (SURVEY.md section 5.1 -
only commented-out chrono remnants); this provides the TPU-era equivalent:
wall-clock stage timing with device synchronization, derived throughput
metrics, and optional XLA profiler traces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["StageTimer", "trace_to"]


@dataclass
class StageTimer:
    """Accumulates per-stage wall-clock with block_until_ready fencing.

    Usage:
        timer = StageTimer()
        with timer.stage("tx"):
            out = tx_step(data)
        print(timer.report(samples_per_call={"tx": batch * frame_len}))
    """

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        result = yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def timeit(self, name: str, fn, *args, iters: int = 5, warmup: int = 1):
        """Time a jitted callable with warmup + fencing; returns secs/call."""
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
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
            lines.append(f"{name:<24}{n:>7}{per * 1e3:>10.3f}{thr:>10}")
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
