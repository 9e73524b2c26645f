"""Profiling/tracing subsystem (SURVEY.md §5: the reference has none beyond
a psutil print, `start_sac_training.py:112`; the TPU build provides
jax.profiler traces + steps/s counters)."""
import os

import jax
import jax.numpy as jnp

from crowdnav_tpu.utils import StepThroughput, annotate, trace, trace_if


def test_step_throughput_counts():
    t = StepThroughput(steps_per_chunk=1000)
    s1 = t.tick()
    s2 = t.tick(500)
    assert s1["total_steps"] == 1000
    assert s2["total_steps"] == 1500
    assert s2["sps"] > 0 and s2["sps_ema"] > 0 and s2["sps_mean"] > 0
    # memory stats callable on any backend
    assert isinstance(t.device_memory(), dict)


def test_trace_writes_xprof_artifacts(tmp_path):
    logdir = str(tmp_path / "xprof")
    with trace(logdir):
        with annotate("traced_matmul"):
            x = jnp.ones((64, 64))
            jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
    files = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert files, "trace produced no artifacts"


def test_trace_if_gating(tmp_path):
    logdir = str(tmp_path / "off")
    with trace_if(logdir, False):
        pass
    assert not os.path.exists(logdir)
    with trace_if(None, True):
        pass
