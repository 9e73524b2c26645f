"""Stage-level timing of the env step on the real chip.

The sweep (results/r3/sweep.json) shows the env half costs ~10 ms per
batched step at 4,096 envs (compute-bound). This harness times the
pipeline stages separately — world integrate+crowd, raycast, segmentation,
tracking+CP, full step — each as a scanned (repeated) jitted program so
per-dispatch latency doesn't pollute the numbers; an accumulator threads
every stage's output so XLA cannot DCE the work.

Usage: python scripts/profile_env_r3.py [--n-envs 4096] [--reps 50]
Writes results/r3/env_profile.json.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crowdnav_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timed_scan(body, carry, reps, iters=5):
    """Compile scan(body, reps), run `iters` times, return s/rep."""
    def prog(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None,
                            length=reps)[0]
    compiled = jax.jit(prog).lower(carry).compile()
    out = compiled(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / (iters * reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=4096)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    from crowdnav_tpu.envs import CrowdEnv, make_config
    from crowdnav_tpu.envs.world import world_step
    from crowdnav_tpu.ops import lidar, risk

    cfg = make_config("crowd_dense", "crowd", jitter=1.0)
    env = CrowdEnv(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), args.n_envs)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.tile(jnp.array([0.15, 0.3], jnp.float32),
                       (args.n_envs, 1))

    res = {}

    # 1. physics: diff-drive integrate + crowd advance + RNG
    res["world_step"] = timed_scan(
        lambda s: jax.vmap(lambda st: world_step(cfg, st, actions[0]))(s),
        states, args.reps)

    # 2. raycast (360 beams x 14 circles + walls)
    def ray_body(carry):
        s, acc = carry
        scans = jax.vmap(lambda st: lidar.scan(
            st.pos, st.yaw, st.ped_pos, cfg.ped_radius,
            cfg.room_half_inner, cfg.max_scan_range, cfg.lidar_min_range,
            cfg.n_scans))(s)
        return s, acc + jnp.sum(scans)
    res["raycast"] = timed_scan(ray_body, (states, jnp.zeros(())),
                                args.reps)

    # 3. segmentation (gradients, labels, runs, confirmation)
    scans0 = jax.jit(jax.vmap(lambda st: lidar.scan(
        st.pos, st.yaw, st.ped_pos, cfg.ped_radius, cfg.room_half_inner,
        cfg.max_scan_range, cfg.lidar_min_range, cfg.n_scans)))(states)
    points0 = jax.jit(jax.vmap(lambda st, sc: lidar.scan_points(
        st.pos, st.yaw, sc, cfg.n_scans)))(states, scans0)

    def seg_body(carry):
        acc = carry
        segs = jax.vmap(lambda sc, pt: risk.segment_scans(cfg, sc, pt))(
            scans0 + acc * 0e-9, points0)
        return acc + jnp.sum(segs.count)
    res["segmentation"] = timed_scan(seg_body, jnp.zeros(()), args.reps)

    # 4. tracking + collision probabilities + top-K (full perceive)
    def perceive_body(carry):
        tracks, acc = carry
        out = jax.vmap(lambda sc, pt, tr, st: risk.perceive(
            cfg, sc, pt, tr, st.pos, st.prev_pos,
            compute_cp=jnp.ones((), bool)))(scans0, points0, tracks,
                                            states)
        return out.tracks, acc + jnp.sum(out.top_k_cp)
    res["track_cp_topk"] = timed_scan(
        perceive_body, (states.tracks, jnp.zeros(())), args.reps)

    # 4b. sub-stages of perceive: tracker update alone, CP alone, top-K
    segs0 = jax.jit(jax.vmap(
        lambda sc, pt: risk.segment_scans(cfg, sc, pt)))(scans0, points0)

    def upd_body(carry):
        tracks, acc = carry
        tr = jax.vmap(lambda t, sg: risk.update_tracks(cfg, t, sg))(
            tracks, segs0)
        return tr, acc + jnp.sum(tr.dist)
    res["update_tracks"] = timed_scan(
        upd_body, (states.tracks, jnp.zeros(())), args.reps)

    def cp_body(carry):
        acc = carry
        cp, ego = jax.vmap(lambda t, st: risk.collision_probabilities(
            cfg, t, st.pos, st.prev_pos))(states.tracks, states)
        return acc + jnp.sum(cp) + jnp.sum(ego)
    res["collision_probs"] = timed_scan(cp_body, jnp.zeros(()), args.reps)

    def topk_body(carry):
        acc = carry
        cp = states.tracks.dist * 0.1
        tcp, tpv = jax.vmap(lambda t, c, st: risk.select_top_k(
            cfg, t, c, jnp.ones((), bool), st.pos))(states.tracks, cp,
                                                    states)
        return acc + jnp.sum(tcp) + jnp.sum(tpv)
    res["select_top_k"] = timed_scan(topk_body, jnp.zeros(()), args.reps)

    # 5. full env step (everything + reward + reset select)
    res["full_step"] = timed_scan(
        lambda s: env.step_batch(s, actions).state, states, args.reps)

    out = {k: round(v * 1e3, 4) for k, v in res.items()}
    out = {"n_envs": args.n_envs, "ms_per_batched_step": out}
    print(json.dumps(out, indent=1), flush=True)
    os.makedirs("results/r3", exist_ok=True)
    with open("results/r3/env_profile.json", "w") as fp:
        json.dump(out, fp, indent=1)


if __name__ == "__main__":
    main()
