"""Round-3 throughput sweep: n_envs × learner-shape on the real TPU chip.

VERDICT r2 next-round item 1: sweep n_envs (512 → 8k) at constant 8:1
sample reuse (updates_per_step × batch / n_envs = 8, the converged
recipe), measure the per-batched-step fixed cost, and find the best
*converging* configuration. Also decomposes the fixed cost empirically:
learner-free rows isolate the env+replay+stats path, a no-reset-bank row
isolates the bank gather.

One process, one TPU client (tpu-relay discipline): all configs run
serially in-process. Writes results/r3/sweep.json (one record per config)
and prints each record as it lands.

Usage:  python scripts/sweep_r3.py [--out results/r3/sweep.json]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def run_config(n_envs, chunk, updates, batch, learning=True, reset_bank=256,
               iters=8):
    from crowdnav_tpu.agents import TD3, TD3Config
    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.parallel import Trainer, TrainerConfig

    cfg = make_config("crowd_dense", "crowd", jitter=1.0)
    env = CrowdEnv(cfg)
    agent = TD3(TD3Config(batch_size=batch), env.obs_dim)
    tcfg = TrainerConfig(n_envs=n_envs, rollout_chunk=chunk,
                         learn_start=256, learning=learning,
                         updates_per_step=updates, reset_bank=reset_bank)
    trainer = Trainer(env, agent, tcfg)
    state = trainer.init(jax.random.PRNGKey(0))
    t_c0 = time.perf_counter()
    compiled = jax.jit(trainer.rollout_chunk,
                       donate_argnums=(0,)).lower(state).compile()
    compile_s = time.perf_counter() - t_c0
    state = compiled(state)                       # warmup
    jax.device_get(state.replay.size)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = compiled(state)
    jax.device_get(state.replay.size)
    dt = time.perf_counter() - t0
    steps = n_envs * chunk * iters
    rec = {
        "n_envs": n_envs, "chunk": chunk, "updates_per_step": updates,
        "batch_size": batch, "learning": learning, "reset_bank": reset_bank,
        "sample_reuse": (updates * batch / n_envs) if learning else 0.0,
        "sps": round(steps / dt, 1),
        "ms_per_batched_step": round(dt / (chunk * iters) * 1e3, 3),
        "compile_s": round(compile_s, 1),
    }
    # free device buffers before the next config
    jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None,
                 state)
    return rec


CONFIGS = [
    # --- n_envs sweep at constant 8:1 sample reuse, reference batch shape
    #     scaled up with the env count (updates fixed at 32) ---
    dict(n_envs=512, chunk=64, updates=32, batch=128),    # r2 converging cfg
    dict(n_envs=1024, chunk=64, updates=32, batch=256),
    dict(n_envs=2048, chunk=64, updates=32, batch=512),
    dict(n_envs=4096, chunk=64, updates=32, batch=1024),
    dict(n_envs=8192, chunk=64, updates=32, batch=2048),
    # --- learner-shape variants at 4096 envs, same 8:1 reuse: fewer,
    #     bigger sequential updates (MXU-friendlier) ---
    dict(n_envs=4096, chunk=64, updates=8, batch=4096),
    dict(n_envs=4096, chunk=64, updates=64, batch=512),
    # --- decomposition rows ---
    dict(n_envs=512, chunk=64, updates=0, batch=128, learning=False),
    dict(n_envs=4096, chunk=64, updates=0, batch=128, learning=False),
    dict(n_envs=8192, chunk=64, updates=0, batch=128, learning=False),
    dict(n_envs=4096, chunk=64, updates=32, batch=1024, reset_bank=0),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/r3/sweep.json")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    records = []
    if os.path.exists(args.out):
        records = json.load(open(args.out))
    done = {json.dumps({k: r[k] for k in ("n_envs", "chunk",
                                          "updates_per_step", "batch_size",
                                          "learning", "reset_bank")},
                       sort_keys=True) for r in records}
    for c in CONFIGS:
        key = json.dumps(dict(n_envs=c["n_envs"], chunk=c["chunk"],
                              updates_per_step=c["updates"],
                              batch_size=c["batch"],
                              learning=c.get("learning", True),
                              reset_bank=c.get("reset_bank", 256)),
                         sort_keys=True)
        if key in done:
            print(f"skip (done): {key}", flush=True)
            continue
        rec = run_config(iters=args.iters, **c)
        print(json.dumps(rec), flush=True)
        records.append(rec)
        with open(args.out, "w") as fp:
            json.dump(records, fp, indent=1)
    print(f"wrote {args.out} ({len(records)} records)", flush=True)


if __name__ == "__main__":
    main()
