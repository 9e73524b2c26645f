"""Benchmark: aggregate env-steps/s of the fused TD3 + perceived-risk
training loop (K=8, crowd-dense — the paper's main config) on real TPU.

Baseline: the reference steps one Gazebo env at <= ~6.7 env-steps/s
wall-clock (0.15 s sleep per action, `environment_stage_1_nobonus.py:
1201-1205`; BASELINE.md). Here N envs step in lockstep on-device with the
learner fused into the same program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_STEPS_PER_SEC = 6.7  # BASELINE.md wall-clock cap of the reference


def _sync(state):
    """Force real completion. block_until_ready returns early through the
    axon relay backend, so fetch a scalar instead."""
    jax.device_get(state.replay.size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--no-learn", action="store_true",
                   help="pure env throughput (no learner updates)")
    args = p.parse_args()

    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import Trainer, TrainerConfig

    cfg = make_config("crowd_dense")
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(), env.obs_dim)
    tcfg = TrainerConfig(n_envs=args.n_envs, rollout_chunk=args.chunk,
                         learn_start=256, learning=not args.no_learn)
    trainer = Trainer(env, agent, tcfg)

    state = trainer.init(jax.random.PRNGKey(0))
    run = trainer.make_jitted()

    # warmup (compile + first chunk)
    state = run(state)
    _sync(state)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state = run(state)
    _sync(state)
    dt = time.perf_counter() - t0

    steps = args.n_envs * args.chunk * args.iters
    sps = steps / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_td3_risk_k8_crowd_dense",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
