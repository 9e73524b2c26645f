"""Multi-host (multi-process) execution plumbing.

The reference is strictly single-machine (SURVEY.md §2.7: ROS pub/sub
between local processes); scaling the env batch across hosts of a TPU slice
is a new-framework obligation (BASELINE.json north star: >=80% multi-host
scaling). The recipe is the standard JAX multi-controller one:

1. every process calls :func:`init_multihost` (jax.distributed.initialize)
   before touching the backend;
2. the mesh is built over ``jax.devices()`` — the *global* device list;
3. every process builds the same host-local trainer state from the same
   seed, and :func:`distribute` turns it into global sharded arrays, each
   process materializing only its addressable shards;
4. the jitted rollout runs SPMD; gradient/metric reductions lower to
   XLA collectives over ICI/DCN.

Per-host env/RNG partitioning falls out of step 3: per-env PRNG keys are
split from the seed along the env axis, and each host owns a disjoint row
block of that axis, so no two hosts ever step the same RNG stream.

Validated by `tests/test_multihost.py` with two `jax.distributed` CPU
processes on localhost (no TPU pod required).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the multi-controller runtime.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers can configure purely via environment;
    on TPU pods with the cloud metadata server available all three may be
    None and auto-detect.
    """
    kw = {}
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def distribute(pytree, shardings):
    """Host-local pytree -> globally sharded pytree.

    Every process holds the full (identical, same-seed) value of each leaf
    and materializes only the shards addressable from its devices. Works
    unchanged in single-process mode (where it is equivalent to
    ``jax.device_put``).
    """
    def put(x, s):
        arr = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            arr.shape, s, lambda idx: arr[idx])

    return jax.tree.map(put, pytree, shardings)


def process_summary() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
