"""Tracing / profiling subsystem.

The reference has almost none of this — a psutil RAM print in the SAC loop
(`start_sac_training.py:112`) and per-episode wall-clock `timelapse`
(`start_td3_training.py:115,143`). SURVEY.md §5 calls for the TPU build to
provide `jax.profiler` traces, per-step env-steps/s counters, and
xprof-compatible annotations; this module is that layer.

Usage::

    timer = StepThroughput(steps_per_chunk=n_envs * chunk)
    with trace_if("/tmp/xprof", chunk == 5):        # one traced chunk
        with annotate("rollout_chunk"):
            state = run(state)
        jax.block_until_ready(state.obs)
    stats = timer.tick()    # {"sps": ..., "sps_ema": ..., "total_steps": ...}
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace of the enclosed block into ``logdir``
    (viewable with TensorBoard's profile plugin / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_if(logdir: str | None, condition: bool):
    """``trace`` gated on a condition (e.g. trace exactly one warm chunk)."""
    if logdir and condition:
        with trace(logdir):
            yield
    else:
        yield


def annotate(name: str):
    """Named region that shows up on the xprof timeline (host + device,
    since it also scopes any ops traced inside jit via named_scope)."""
    return jax.profiler.TraceAnnotation(name)


class StepThroughput:
    """Running env-steps/s counter: instantaneous, EMA, and lifetime mean.

    The reference's only throughput signal is episode wall-clock
    (`start_td3_training.py:115,143`); the batched engine needs a
    steps/s-first view.
    """

    def __init__(self, steps_per_chunk: int, ema_alpha: float = 0.2):
        self.steps_per_chunk = steps_per_chunk
        self.ema_alpha = ema_alpha
        self.total_steps = 0
        self.sps_ema = None
        self._t_last = time.perf_counter()
        self._t_start = self._t_last

    def tick(self, steps: int | None = None) -> dict:
        """Call once per completed chunk (after block_until_ready)."""
        now = time.perf_counter()
        steps = self.steps_per_chunk if steps is None else steps
        dt = max(now - self._t_last, 1e-9)
        sps = steps / dt
        self.total_steps += steps
        self.sps_ema = (sps if self.sps_ema is None else
                        self.ema_alpha * sps +
                        (1 - self.ema_alpha) * self.sps_ema)
        self._t_last = now
        return {
            "sps": sps,
            "sps_ema": self.sps_ema,
            "sps_mean": self.total_steps / max(now - self._t_start, 1e-9),
            "total_steps": self.total_steps,
        }

    def device_memory(self) -> dict:
        """Per-device live HBM bytes (0s on backends without the stat)."""
        out = {}
        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            out[f"{d.platform}:{d.id}"] = stats.get("bytes_in_use", 0)
        return out
