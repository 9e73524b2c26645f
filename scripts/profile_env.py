"""Stage-level timing of the env step on the real chip (round 4).

Fixes the r3 profiler's two inconsistencies (VERDICT r3 weakness 2):

- every stage body now perturbs its inputs with the accumulator
  (``x + acc * 0``) so XLA cannot hoist a loop-invariant stage out of the
  timing scan — the r3 ``collision_probs``/``select_top_k`` rows (0.1 ms)
  were hoisted no-ops;
- the composed ``perceive`` row is measured with the SAME carried
  track-state as the full step, and a ``consistency`` block reports
  sum(stages) vs the composed rows so the artifact is self-checking.

Usage: python scripts/profile_env.py [--n-envs 4096] [--reps 50]
Writes results/r4/env_profile.json.
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
    p.add_argument("--out", default="results/r4/env_profile.json")
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

    # fixed inputs for the perception stages (perturbed by acc in-loop)
    scans0 = jax.jit(jax.vmap(lambda st: lidar.scan(
        st.pos, st.yaw, st.ped_pos, cfg.ped_radius, cfg.room_half_inner,
        cfg.max_scan_range, cfg.lidar_min_range, cfg.n_scans)))(states)
    points0 = jax.jit(jax.vmap(lambda st, sc: lidar.scan_points(
        st.pos, st.yaw, sc, cfg.n_scans)))(states, scans0)
    segs0 = jax.jit(jax.vmap(
        lambda sc, pt: risk.segment_scans(cfg, sc, pt)))(scans0, points0)

    res = {}
    jitter = lambda x, acc: x + acc * 0e-9   # defeats loop hoisting

    # 1. physics: diff-drive integrate + crowd advance + RNG
    res["world_step"] = timed_scan(
        lambda s: jax.vmap(lambda st: world_step(cfg, st, actions[0]))(s),
        states, args.reps)

    # 2. raycast
    def ray_body(carry):
        acc = carry
        scans = jax.vmap(lambda st, p: lidar.scan(
            p, st.yaw, st.ped_pos, cfg.ped_radius,
            cfg.room_half_inner, cfg.max_scan_range, cfg.lidar_min_range,
            cfg.n_scans))(states, jitter(states.pos, acc))
        return acc + jnp.sum(scans)
    res["raycast"] = timed_scan(ray_body, jnp.zeros(()), args.reps)

    # 3. segmentation
    def seg_body(carry):
        acc = carry
        segs = jax.vmap(lambda sc, pt: risk.segment_scans(cfg, sc, pt))(
            jitter(scans0, acc), points0)
        return acc + jnp.sum(segs.count)
    res["segmentation"] = timed_scan(seg_body, jnp.zeros(()), args.reps)

    # 4. tracker update alone (carried tracks, fixed segments)
    def upd_body(carry):
        tracks, acc = carry
        segs = segs0._replace(center_pos=jitter(segs0.center_pos, acc))
        tr = jax.vmap(lambda t, sg: risk.update_tracks(cfg, t, sg))(
            tracks, segs)
        return tr, acc + jnp.sum(tr.dist)
    res["update_tracks"] = timed_scan(
        upd_body, (states.tracks, jnp.zeros(())), args.reps)

    # 5. collision probabilities alone (hoist-proofed: r3 measured a
    #    loop-invariant no-op here)
    def cp_body(carry):
        acc = carry
        tr = states.tracks.replace(pos=jitter(states.tracks.pos, acc))
        cp, ego = jax.vmap(lambda t, st: risk.collision_probabilities(
            cfg, t, st.pos, st.prev_pos))(tr, states)
        return acc + jnp.sum(cp) + jnp.sum(ego)
    res["collision_probs"] = timed_scan(cp_body, jnp.zeros(()), args.reps)

    # 6. top-K alone (hoist-proofed)
    def topk_body(carry):
        acc = carry
        cp = jitter(states.tracks.dist * 0.1, acc)
        tcp, tpv = jax.vmap(lambda t, c, st: risk.select_top_k(
            cfg, t, c, jnp.ones((), bool), st.pos))(states.tracks, cp,
                                                    states)
        return acc + jnp.sum(tcp) + jnp.sum(tpv)
    res["select_top_k"] = timed_scan(topk_body, jnp.zeros(()), args.reps)

    # 7. composed perceive (seg + tracker + cp + topk), carried tracks —
    #    the shape it runs in inside the full step
    def perceive_body(carry):
        tracks, acc = carry
        out = jax.vmap(lambda sc, pt, tr, st: risk.perceive(
            cfg, sc, pt, tr, st.pos, st.prev_pos,
            compute_cp=jnp.ones((), bool)))(jitter(scans0, acc), points0,
                                            tracks, states)
        return out.tracks, acc + jnp.sum(out.top_k_cp)
    res["perceive_composed"] = timed_scan(
        perceive_body, (states.tracks, jnp.zeros(())), args.reps)

    # 7b. fused pallas kernel for the same tracker+CP+topK chain
    from crowdnav_tpu.ops.risk_pallas import track_cp_topk_batch

    def pallas_body(carry):
        tracks, acc = carry
        segs = segs0._replace(center_pos=jitter(segs0.center_pos, acc))
        nt, tcp, tpv, cpm, ego = track_cp_topk_batch(
            cfg, segs, tracks, states.pos, states.prev_pos,
            jnp.ones((args.n_envs,), bool))
        return nt, acc + jnp.sum(tcp)
    res["track_cp_topk_pallas"] = timed_scan(
        pallas_body, (states.tracks, jnp.zeros(())), args.reps)

    # 7c. observation tail stages (the previously-unattributed residual)
    from crowdnav_tpu.envs import crowd_env as ce

    def sp_body(carry):
        acc = carry
        pts = jax.vmap(lambda st, sc: lidar.scan_points(
            st.pos, st.yaw, sc, cfg.n_scans))(states, jitter(scans0, acc))
        return acc + jnp.sum(pts)
    res["scan_points"] = timed_scan(sp_body, jnp.zeros(()), args.reps)

    wp0, dtg0, htg0 = jax.jit(jax.vmap(
        lambda st: ce._goal_features(cfg, st)))(states)

    def gf_body(carry):
        acc = carry
        sts = states.replace(pos=jitter(states.pos, acc))
        wp, dtg, htg = jax.vmap(lambda st: ce._goal_features(cfg, st))(sts)
        return acc + jnp.sum(wp) + jnp.sum(dtg) + jnp.sum(htg)
    res["goal_features"] = timed_scan(gf_body, jnp.zeros(()), args.reps)

    out0 = jax.jit(jax.vmap(lambda sc, pt, tr, st: risk.perceive(
        cfg, sc, pt, tr, st.pos, st.prev_pos,
        compute_cp=jnp.ones((), bool))))(scans0, points0, states.tracks,
                                         states)

    def fo_body(carry):
        acc = carry
        o = out0._replace(top_k_pose_vel=jitter(out0.top_k_pose_vel, acc))
        st2, obs, _, done, ag = jax.vmap(
            lambda st, sc, o_, w, d, h: ce._finish_observe(
                cfg, st, sc, o_, w, d, h, jnp.ones((), bool)))(
            states, scans0, o, wp0, dtg0, htg0)
        return acc + jnp.sum(obs)
    res["finish_observe"] = timed_scan(fo_body, jnp.zeros(()), args.reps)

    def rw_body(carry):
        acc = carry
        r, st2 = jax.vmap(lambda st, d, h: ce._reward(
            cfg, st, d, h, jnp.zeros((), bool), jnp.zeros((), bool)))(
            states, jitter(dtg0, acc), htg0)
        return acc + jnp.sum(r)
    res["reward"] = timed_scan(rw_body, jnp.zeros(()), args.reps)

    # 8. full env step (everything + reward + reset select)
    res["full_step"] = timed_scan(
        lambda s: env.step_batch(s, actions).state, states, args.reps)

    # 8b. full env step with the pallas risk backend
    env_p = CrowdEnv(make_config("crowd_dense", "crowd", jitter=1.0,
                                 risk_backend="pallas"))
    res["full_step_risk_pallas"] = timed_scan(
        lambda s: env_p.step_batch(s, actions).state, states, args.reps)

    stage_sum = (res["world_step"] + res["raycast"] + res["segmentation"]
                 + res["update_tracks"] + res["collision_probs"]
                 + res["select_top_k"])
    pallas_parts = (res["world_step"] + res["raycast"] + res["scan_points"]
                    + res["segmentation"] + res["track_cp_topk_pallas"]
                    + res["goal_features"] + res["finish_observe"]
                    + res["reward"])
    out = {k: round(v * 1e3, 4) for k, v in res.items()}
    record = {
        "n_envs": args.n_envs,
        "ms_per_batched_step": out,
        "consistency": {
            "stage_sum_ms": round(stage_sum * 1e3, 4),
            "pallas_step_parts_ms": round(pallas_parts * 1e3, 4),
            "pallas_step_residual_ms": round(
                (res["full_step_risk_pallas"] - pallas_parts) * 1e3, 4),
            "perceive_parts_ms": round(
                (res["segmentation"] + res["update_tracks"]
                 + res["collision_probs"] + res["select_top_k"]) * 1e3, 4),
            "note": "full_step may be below stage_sum (cross-stage fusion"
                    ") or above perceive parts (fusion boundaries at the "
                    "carried TrackState); a composed row exceeding "
                    "full_step would indicate a measurement bug",
            "sane": bool(res["perceive_composed"]
                         <= res["full_step"] * 1.15),
        },
    }
    print(json.dumps(record, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fp:
        json.dump(record, fp, indent=1)


if __name__ == "__main__":
    main()
