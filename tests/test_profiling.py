"""Tests: StageTimer fencing (fetch-forced, not dispatch-only) and reporting.

Regression for the round-2 finding that ``result = yield`` inside a
contextmanager is always None (the fence never ran) and that
block_until_ready does not force execution on tunneled backends.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gfdm_tpu.utils.profiling import StageTimer, force


def test_stage_fences_on_assigned_result():
    timer = StageTimer()
    x = jnp.ones((256, 256))

    @jax.jit
    def work(a):
        for _ in range(8):
            a = a @ a / 256.0
        return a

    work(x)  # compile outside the timed region
    with timer.stage("matmul") as s:
        s.value = work(x)
    assert timer.counts["matmul"] == 1
    assert "matmul" not in timer.unfenced
    assert np.isfinite(np.asarray(s.value)).all()
    # the fenced time covers execution, so it must be non-trivial wall clock
    assert timer.times["matmul"] > 0


def test_stage_without_assignment_is_flagged_unfenced():
    timer = StageTimer()
    with timer.stage("dispatch_only"):
        jnp.ones(4) * 2
    assert "dispatch_only" in timer.unfenced
    assert "(dispatch only)" in timer.report()


def test_timeit_measures_execution_not_dispatch():
    """A deliberately slow host-callback stage must show its real duration;
    if only dispatch were timed this would read as ~0."""
    timer = StageTimer()

    def slow(x):
        time.sleep(0.02)
        return x + 1

    dt = timer.timeit("slow", slow, np.zeros(3), iters=3, warmup=1)
    assert dt >= 0.02


def test_force_handles_pytrees_and_scalars():
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": (jnp.float32(1.5), None)}
    force(tree)  # must not raise on nested / scalar / None leaves
    force(None)
    force(np.zeros(3))  # non-jax leaves are ignored


def test_report_throughput_column():
    timer = StageTimer()
    timer.timeit("stage_a", lambda: jnp.zeros(8), iters=2, warmup=1)
    rep = timer.report(samples_per_call={"stage_a": 1_000_000})
    assert "stage_a" in rep and "Msamp/s" in rep
