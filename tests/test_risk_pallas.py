"""Fused tracker+CP+topK Pallas kernel vs the XLA reference path.

The kernel (`ops/risk_pallas.py`) must bit-match `risk.update_tracks` →
`collision_probabilities` → `select_top_k` under the default quirks
policy, across randomized segment/track populations including the edge
cases: empty segments, full track table, IOU ties (first-index argmax),
CP ties (stable top-K), fresh-track -1 speed sentinel."""
import jax
import jax.numpy as jnp
import numpy as np

from crowdnav_tpu.envs import CrowdEnv, make_config
from crowdnav_tpu.ops import risk
from crowdnav_tpu.ops.risk_pallas import track_cp_topk_batch


def _random_state(cfg, key, n):
    """Random but structurally plausible batched segments + tracks."""
    S, T = cfg.max_segments, cfg.max_tracks
    ks = jax.random.split(key, 10)
    seg_valid = jax.random.uniform(ks[0], (n, S)) < 0.4
    # quantized positions make IOU ties common (tie-break coverage)
    cpos = jnp.round(jax.random.uniform(ks[1], (n, S, 2), minval=-1.2,
                                        maxval=1.2) * 8) / 8
    cdist = jax.random.uniform(ks[2], (n, S), minval=0.08, maxval=0.62)
    segs = risk.Segments(
        valid=seg_valid,
        is_obstacle=seg_valid & (jax.random.uniform(ks[3], (n, S)) < 0.7),
        confirmed=seg_valid & (jax.random.uniform(ks[4], (n, S)) < 0.8),
        center_pos=cpos, center_dist=cdist,
        count=jnp.where(seg_valid, 5, 0).astype(jnp.int32))
    t_valid = jax.random.uniform(ks[5], (n, T)) < 0.5
    tpos = jnp.round(jax.random.uniform(ks[6], (n, T, 2), minval=-1.2,
                                        maxval=1.2) * 8) / 8
    from crowdnav_tpu.envs.world import TrackState
    tracks = TrackState(
        valid=t_valid,
        pos=tpos,
        prev_pos=tpos + jax.random.normal(ks[7], (n, T, 2)) * 0.03,
        has_prev=t_valid & (jax.random.uniform(ks[8], (n, T)) < 0.8),
        dist=jax.random.uniform(ks[9], (n, T), minval=0.08, maxval=0.62),
        speed=jnp.abs(jax.random.normal(ks[0], (n, T))) * 0.3,
        vel=jax.random.normal(ks[1], (n, T, 2)) * 0.1)
    pos = jax.random.uniform(ks[2], (n, 2), minval=-1.0, maxval=1.0)
    prev = pos - jax.random.normal(ks[3], (n, 2)) * 0.03
    return segs, tracks, pos, prev


def _xla_reference(cfg, segs, tracks, pos, prev, compute_cp):
    def one(sg, tr, p, pp, cc):
        nt = risk.update_tracks(cfg, tr, sg)
        cp, ego = risk.collision_probabilities(cfg, nt, p, pp)
        live = cc & jnp.any(nt.valid)
        top_cp, top_pv = risk.select_top_k(cfg, nt, cp, live, p)
        cp_max = jnp.where(live, jnp.max(top_cp), 0.0)
        ego_cp = jnp.where(live, jnp.max(jnp.where(nt.valid, ego, 0.0)),
                           0.0)
        return nt, top_cp, top_pv, cp_max, ego_cp
    return jax.vmap(one)(segs, tracks, pos, prev, compute_cp)


def test_kernel_matches_xla_randomized():
    cfg = make_config("crowd_dense", "crowd")
    n = 96          # non-multiple of 128: exercises padding
    for seed in range(3):
        segs, tracks, pos, prev = _random_state(cfg, jax.random.PRNGKey(seed),
                                                n)
        cc = jnp.arange(n) % 7 != 0   # mix of compute_cp on/off
        ref = _xla_reference(cfg, segs, tracks, pos, prev, cc)
        got = track_cp_topk_batch(cfg, segs, tracks, pos, prev, cc)
        names = ["tracks", "top_cp", "top_pose_vel", "cp_max", "ego_cp"]
        for name, r, g in zip(names, ref, got):
            for lr, lg in zip(jax.tree.leaves(r), jax.tree.leaves(g)):
                np.testing.assert_allclose(
                    np.asarray(lg), np.asarray(lr), rtol=1e-6, atol=1e-6,
                    err_msg=f"{name} seed={seed}")


def test_kernel_edge_cases():
    cfg = make_config("crowd_dense", "crowd")
    from crowdnav_tpu.envs.world import TrackState
    S, T = cfg.max_segments, cfg.max_tracks
    n = 4
    # env 0: nothing at all; env 1: all tracks valid, no segments;
    # env 2: segments only (mass insertion); env 3: exact-tie IOUs
    z = jnp.zeros
    seg_valid = jnp.zeros((n, S), bool).at[2, :10].set(True) \
        .at[3, :2].set(True)
    cpos = z((n, S, 2)).at[3, 0].set(jnp.array([0.5, 0.5])) \
        .at[3, 1].set(jnp.array([0.5, 0.5]))        # identical -> IOU tie
    segs = risk.Segments(valid=seg_valid, is_obstacle=seg_valid,
                         confirmed=seg_valid, center_pos=cpos,
                         center_dist=jnp.full((n, S), 0.3),
                         count=seg_valid.astype(jnp.int32) * 5)
    t_valid = jnp.zeros((n, T), bool).at[1].set(True).at[3, 0].set(True)
    tracks = TrackState(valid=t_valid,
                        pos=z((n, T, 2)).at[3, 0].set(
                            jnp.array([0.5, 0.5])),
                        prev_pos=z((n, T, 2)), has_prev=t_valid,
                        dist=jnp.full((n, T), 0.4),
                        speed=jnp.full((n, T), 0.2), vel=z((n, T, 2)))
    pos = jnp.tile(jnp.array([[0.1, -0.1]]), (n, 1))
    prev = jnp.tile(jnp.array([[0.08, -0.12]]), (n, 1))
    cc = jnp.ones((n,), bool)
    ref = _xla_reference(cfg, segs, tracks, pos, prev, cc)
    got = track_cp_topk_batch(cfg, segs, tracks, pos, prev, cc)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_step_batch_risk_pallas_matches_xla():
    """Full env step with risk_backend='pallas' vs the vmapped XLA step:
    identical observations, rewards, dones, and carried track state over a
    multi-step rollout (the kernel inside its real call site)."""
    n, steps = 16, 12
    cfg_x = make_config("crowd_dense", "crowd", jitter=1.0)
    cfg_p = make_config("crowd_dense", "crowd", jitter=1.0,
                        risk_backend="pallas")
    env_x, env_p = CrowdEnv(cfg_x), CrowdEnv(cfg_p)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    sx, ox = jax.jit(jax.vmap(env_x.reset))(keys)
    sp, op = jax.jit(jax.vmap(env_p.reset))(keys)
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(op))

    step_x = jax.jit(env_x.step_batch)
    step_p = jax.jit(env_p.step_batch)
    acts = jax.random.uniform(jax.random.PRNGKey(1), (steps, n, 2),
                              minval=jnp.array([0.0, -2.0]),
                              maxval=jnp.array([0.22, 2.0]))
    for t in range(steps):
        outx = step_x(sx, acts[t])
        outp = step_p(sp, acts[t])
        np.testing.assert_allclose(np.asarray(outp.obs),
                                   np.asarray(outx.obs), atol=1e-6,
                                   err_msg=f"obs step {t}")
        np.testing.assert_allclose(np.asarray(outp.reward),
                                   np.asarray(outx.reward), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(outp.done),
                                      np.asarray(outx.done))
        np.testing.assert_allclose(
            np.asarray(outp.state.tracks.pos),
            np.asarray(outx.state.tracks.pos), atol=1e-6)
        sx, sp = outx.state, outp.state


def test_strict_quirks_rejects_pallas_backend():
    import pytest
    cfg = make_config("crowd_dense", "crowd", risk_backend="pallas",
                      strict_quirks=True)
    with pytest.raises(ValueError):
        CrowdEnv(cfg)
