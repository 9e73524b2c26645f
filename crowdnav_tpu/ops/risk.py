"""Perceived-risk pipeline: lidar-only obstacle segmentation, wall/obstacle
classification, fixed-slot tracking, collision-cone CP, top-K selection.

This is the fixed-shape re-architecture of the reference's ~800-line
sequential pipeline `environment_stage_1_nobonus.Env.get_state:245-1044`
(SURVEY.md §3.2). The reference builds variable-length Python lists, uuid
dicts and deques; here every stage is a masked array op over the 359-beam
ring and ``max_segments`` / ``max_tracks`` slots so the whole thing jits and
vmaps over thousands of envs.

Stage map (reference lines in parentheses):

1.  gradient + change-of-gradient per beam               (:329-367)
2.  wall/obstacle point labels from change-of-gradient    (:369-410)
3.  run segmentation by bounding-box association          (:447-506)
    + wrap-around merge of first/last run                 (:487-502)
4.  per-segment type confirmation by expected-scan-count  (:568-620)
5.  slot tracker: IOU matching, update/remove/insert      (:656-743)
6.  velocity estimation from consecutive positions        (:745-761)
7.  collision-cone TTC -> collision probability           (:765-860)
8.  top-K by CP, padded with the robot pose               (:862-905)

Documented quirks reproduced intentionally (they shaped the published
learning curves): fresh tracks carry speed ``-1`` which inflates the
resultant closing speed (:667,793); stored track velocity is
``(prev - curr)/dt``, i.e. the negated motion (:806-810).
Documented quirks *fixed* under the default (``strict_quirks=False``)
semantics: per-track closing speed instead of the first track's (:793);
per-track collision-cone line instead of the loop-final one (:798-815);
top-K takes the *highest*-CP tracks (the reference's ``sorted(desc)[-K:]``
keeps the lowest K when more than K tracks exist, :882-883).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Per-segment aggregation strategy (A/B-able on chip, see segment_scans):
# "reduce" (default) computes counts / center picks as masked reductions
# whose (n, S) broadcast-compare inputs fuse into the reduction — nothing
# (n, S)-shaped touches HBM; "einsum" materializes f32 one-hot operands and
# contracts them on the MXU (the round-3 formulation). The masked reduce
# measures faster on chip (env_profile.json): the einsum's two one-hot
# operands were ~92 KB/env of HBM traffic, dwarfing the tiny matmul.
_SEG_IMPL = os.environ.get("CROWDNAV_SEG_IMPL", "reduce")
if _SEG_IMPL not in ("reduce", "einsum"):
    raise ValueError(
        f"CROWDNAV_SEG_IMPL={_SEG_IMPL!r}: must be 'reduce' or 'einsum'")

from crowdnav_tpu.envs.config import EnvConfig
from crowdnav_tpu.envs.world import TrackState
from crowdnav_tpu.ops import geom

# Exact one-hot contraction. TPU's DEFAULT matmul precision feeds the MXU
# bf16, which would quantize the selected values (and misround integer
# counts > 256, bf16's exact-integer limit); HIGHEST keeps these selection
# matmuls bit-exact while still vectorizing on the MXU.
def _exact_select(onehot, vals):
    return jnp.matmul(onehot, vals, precision=jax.lax.Precision.HIGHEST)


class Segments(NamedTuple):
    """Per-segment (run) aggregates, fixed ``max_segments`` slots."""

    valid: jax.Array        # (S,) bool
    is_obstacle: jax.Array  # (S,) bool — confirmed type 'o'
    confirmed: jax.Array    # (S,) bool — survived type confirmation
    center_pos: jax.Array   # (S, 2)
    center_dist: jax.Array  # (S,)
    count: jax.Array        # (S,) int32


class RiskOutput(NamedTuple):
    tracks: TrackState
    top_k_pose_vel: jax.Array   # (K, 4): x, y, vx, vy per top-CP obstacle
    top_k_cp: jax.Array         # (K,)
    cp_max: jax.Array           # () highest CP among tracked obstacles
    ego_cp: jax.Array           # () max TTC-only CP (:837,879)
    obstacle_seen: jax.Array    # () bool — any confirmed obstacle (:653)
    ego_violation: jax.Array    # () bool — obstacle closer than 0.140 (:999)
    segments: Segments
    # (S,) int32 social-region code of each segment center (the reference
    # computes FRF/FLF/FRC/FLC per scan point, :296-305; per-segment here —
    # geom.social_region docstring has the code table). None when the caller
    # did not supply a yaw (regions are debug/viz data, not policy input).
    segment_regions: jax.Array | None = None


def ground_truth_bbox_size(cfg: EnvConfig) -> float:
    """Average distance between consecutive free-space scan endpoints — the
    association bounding-box half-size (`compute_average_bounding_box_size`
    `utils.py:405-419` over the all-0.6 ground-truth ring, computed once at
    reset `environment_stage_1_nobonus.py:287-290`). Static given the config.
    """
    import math
    n = cfg.n_scans
    step_gap = 2.0 * cfg.max_scan_range * math.sin(math.pi / 360.0)
    ang = math.radians(n - 1)  # chord from endpoint 0 deg to (n-1) deg
    wrap_gap = cfg.max_scan_range * math.sqrt(
        (math.cos(ang) - 1.0) ** 2 + math.sin(ang) ** 2)
    return ((n - 1) * step_gap + wrap_gap) / n


def segment_scans(cfg: EnvConfig, scans, points):
    """Stages 1-4: label beams, group into runs, confirm segment types."""
    n = cfg.n_scans
    S = cfg.max_segments
    free = scans >= cfg.max_scan_range
    occupied = ~free

    nxt = lambda a: jnp.roll(a, -1, axis=0)   # ring neighbour i+1 (wraps)
    prv = lambda a: jnp.roll(a, 1, axis=0)

    # component-wise x/y throughout: slicing the packed (n, 2) points
    # per-expression left trailing-size-1 dims in the lowered HLO, which
    # XLA tiled as T(1,128) pred/f32 chains costing ~1.3 ms/step at 16k
    # envs (not_and_fusion.2 in the r4 xprof trace)
    px, py = points[:, 0], points[:, 1]
    npx, npy = nxt(px), nxt(py)

    # -- 1. gradients (x-over-y, the gazebo-axis-swap convention :334-345) --
    dx = px - npx
    dy = py - npy
    grad = jnp.where(dy == 0.0, 0.0, dx / jnp.where(dy == 0.0, 1.0, dy))
    grad = jnp.round(grad, cfg.grad_round_decimals)
    grad_valid = occupied
    change = jnp.abs(grad - nxt(grad))
    change = jnp.round(change, cfg.grad_round_decimals)
    change_valid = grad_valid & nxt(grad_valid)

    # -- 2. wall vs obstacle point labels: collinear (zero change-of-gradient)
    # points are wall-like; the reference's delayed-update heuristic also
    # flips a point to wall when the *next* change is zero (:388-401) --
    wall_pt = change_valid & ((change == 0.0)
                              | (nxt(change_valid) & (nxt(change) == 0.0)))
    obs_pt = change_valid & ~wall_pt

    # -- 3. run segmentation --
    bbox = ground_truth_bbox_size(cfg)
    # component-wise geom.boxes_associated(points, nxt(points), bbox).
    # Default = raw overlap (intended semantics); strict_quirks = the
    # reference's literal rounded-IOU form. The round-5 hardware A/B that
    # sent the rounded form to strict-quirks land is documented in the
    # boxes_associated docstring.
    side = 2.0 * bbox
    if cfg.strict_quirks:
        inter = (jnp.maximum(side - jnp.abs(dx), 0.0)
                 * jnp.maximum(side - jnp.abs(dy), 0.0))
        assoc_next = inter * 1.0005 > 1e-3 * side * side
    else:
        assoc_next = (jnp.abs(dx) < side) & (jnp.abs(dy) < side)
    boundary_prev = ~prv(occupied) | ~prv(assoc_next)
    start = occupied & boundary_prev
    # beam 0 always opens a run (runs are scanned linearly; ring closure is
    # handled by the wrap merge below, :487-502)
    start = start.at[0].set(occupied[0])
    run_id_raw = jnp.cumsum(start.astype(jnp.int32)) - 1
    run_id = jnp.where(occupied, jnp.minimum(run_id_raw, S), S)
    n_runs = jnp.max(jnp.where(occupied, run_id_raw + 1, 0))

    idx = jnp.arange(n, dtype=jnp.int32)
    # per-run reductions over the (n, S) run-membership space: scatters
    # (segment_sum) serialize on TPU, so both strategies are dense.
    onehot = (run_id[:, None] == jnp.arange(S)[None, :])        # (n, S) bool
    if _SEG_IMPL == "reduce":
        # masked sum-reductions: the broadcast compare fuses into the
        # reduce, so no (n, S) operand is ever materialized to HBM
        def _count(m):
            return jnp.sum(jnp.where(onehot & m[:, None], 1, 0), axis=0)

        seg_count = _count(occupied)
        seg_count_o = _count(obs_pt)
        seg_count_w = _count(wall_pt)
    else:
        # one (n,S)x(n,3) MXU contraction; counts <= n = 359 exact in f32
        feats = jnp.stack([occupied, obs_pt, wall_pt],
                          axis=-1).astype(jnp.float32)          # (n, 3)
        counts = jnp.einsum("ns,nf->sf", onehot.astype(jnp.float32),
                            feats,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(jnp.int32)                 # (S, 3)
        seg_count, seg_count_o, seg_count_w = (counts[:, 0], counts[:, 1],
                                               counts[:, 2])
    seg_start = jnp.min(jnp.where(onehot & occupied[:, None],
                                  idx[:, None], n), axis=0)
    seg_valid = seg_count > 0

    # wrap merge: first & last runs belong to one object when their endpoint
    # boxes (double size, for the lidar blind spot) overlap (:454-455,490-502)
    last_id = jnp.maximum(n_runs - 1, 0)
    first_pt = points[0]
    last_pt = points[n - 1]
    do_merge = (seg_valid[0] & (n_runs > 1) & (last_id < S)
                & occupied[0] & occupied[n - 1]
                & (run_id[n - 1] == last_id)
                & geom.boxes_associated(first_pt, last_pt, bbox * 2.0,
                                        rounded=cfg.strict_quirks))
    sl = jnp.arange(S)
    merged_into_0 = do_merge & (sl == last_id)
    count0_pre_merge = seg_count[0]
    seg_count0 = seg_count[0] + jnp.where(do_merge, seg_count[last_id], 0)
    seg_count_o0 = seg_count_o[0] + jnp.where(do_merge, seg_count_o[last_id], 0)
    seg_count_w0 = seg_count_w[0] + jnp.where(do_merge, seg_count_w[last_id], 0)
    seg_count = jnp.where(sl == 0, seg_count0,
                          jnp.where(merged_into_0, 0, seg_count))
    seg_count_o = jnp.where(sl == 0, seg_count_o0,
                            jnp.where(merged_into_0, 0, seg_count_o))
    seg_count_w = jnp.where(sl == 0, seg_count_w0,
                            jnp.where(merged_into_0, 0, seg_count_w))
    seg_valid = seg_count > 0

    # center element: concat order is [run0..., runlast...] (:494-496), both
    # runs contiguous in beam order, so the rank-r element of the merged
    # segment is beam (start0 + r) while r < count0 else (startlast + r-count0)
    center_rank = seg_count // 2
    count_first = jnp.where((sl == 0) & do_merge, count0_pre_merge,
                            seg_count)
    in_first = center_rank < count_first
    start_last = seg_start[last_id]
    center_beam = jnp.where(
        in_first, seg_start + center_rank,
        start_last + (center_rank - count_first))
    center_beam = jnp.clip(center_beam, 0, n - 1)
    # no scans[center_beam] gather: the vmapped per-row dynamic gather
    # lowers to a ~3 ms/step kernel on TPU at 4k envs (xprof fusion.792,
    # round 3). Exact alternatives, selected by _SEG_IMPL:
    center_mask = (center_beam[:, None] == jnp.arange(n)[None, :])  # (S, n)
    if _SEG_IMPL == "reduce":
        # masked max-reduce picks the exact f32 value (no arithmetic on
        # it); the compare fuses into the reduce — nothing materializes
        def _pick(v):                       # (n,) -> (S,)
            return jnp.max(jnp.where(center_mask, v[None, :], -jnp.inf),
                           axis=1)

        center_dist = _pick(scans)
        center_pos = jnp.stack([_pick(px), _pick(py)], axis=-1)
    else:
        # (S, n) one-hot matmul: each row sums exactly one element (MXU)
        center_oh = center_mask.astype(jnp.float32)
        center_dist = _exact_select(center_oh, scans)
        center_pos = _exact_select(center_oh, points)

    # -- 4. type confirmation (:568-620) --
    n_valid = jnp.sum(seg_valid.astype(jnp.int32))
    est = geom.estimate_num_obs_scans(center_dist, cfg.max_scan_range,
                                      cfg.min_scan_range)
    big_enough = seg_count >= cfg.min_segment_scans
    mixed = (seg_count_o > 0) & (seg_count_w > 0)
    majority_o = seg_count_o > seg_count_w
    score = seg_count_o / jnp.maximum(
        jnp.minimum(seg_count.astype(jnp.float32), est), 1.0)
    mixed_type_o = jnp.where(
        score >= 0.5, majority_o,
        jnp.where(seg_count.astype(jnp.float32) <= est, majority_o, False))
    mixed_keep = jnp.ones_like(mixed)
    ident_keep = seg_count.astype(jnp.float32) > jnp.minimum(
        n_valid.astype(jnp.float32), est)
    ident_type_o = seg_count_w == 0
    confirmed = seg_valid & big_enough & jnp.where(mixed, mixed_keep,
                                                   ident_keep)
    is_obstacle = jnp.where(mixed, mixed_type_o, ident_type_o)

    return Segments(valid=seg_valid, is_obstacle=is_obstacle & confirmed,
                    confirmed=confirmed, center_pos=center_pos,
                    center_dist=center_dist, count=seg_count)


def update_tracks(cfg: EnvConfig, tracks: TrackState,
                  segs: Segments) -> TrackState:
    """Stage 5-6: IOU-matched track update / removal / insertion.

    Each live track greedily claims its max-IOU confirmed object (walls
    included, as in :688-689); zero-IOU tracks are dropped; unclaimed
    *obstacle* objects open new tracks in free slots (:722-743).
    """
    T, S = cfg.max_tracks, cfg.max_segments
    cand = segs.confirmed                                   # (S,)
    iou = geom.box_iou(tracks.pos[:, None, :], segs.center_pos[None, :, :],
                       cfg.ped_radius)                      # (T, S)
    iou = jnp.where(cand[None, :], iou, -1.0)
    best_j = jnp.argmax(iou, axis=1)                        # (T,)
    best_iou = jnp.max(iou, axis=1)
    matched = tracks.valid & (best_iou > 0.0)

    # one-hot matmuls instead of [best_j] gathers (TPU gather pathology —
    # see segment_scans center_oh comment); pos + dist contract in ONE
    # (T,S)x(S,3) matmul
    bj_eq = best_j[:, None] == jnp.arange(S)[None, :]       # (T, S)
    picked = _exact_select(
        bj_eq.astype(jnp.float32),
        jnp.concatenate([segs.center_pos, segs.center_dist[:, None]],
                        axis=-1))                           # (T, 3)
    new_pos, new_dist = picked[:, :2], picked[:, 2]
    delta = tracks.pos - new_pos                            # prev - curr
    speed = jnp.linalg.norm(delta, axis=-1) / cfg.dt
    upd = TrackState(
        valid=matched,
        pos=jnp.where(matched[:, None], new_pos, tracks.pos),
        prev_pos=jnp.where(matched[:, None], tracks.pos, tracks.prev_pos),
        has_prev=matched,
        dist=jnp.where(matched, new_dist, tracks.dist),
        speed=jnp.where(matched, speed, tracks.speed),
        vel=jnp.where(matched[:, None], delta / cfg.dt, tracks.vel),
    )

    # insertion of unclaimed obstacle objects — all dense (scatters
    # serialize on TPU): claimed via a (T, S) one-hot reduce, slot
    # assignment by matching free-slot rank to unclaimed-object rank
    claimed = jnp.any(bj_eq & matched[:, None], axis=0)     # (S,)
    insert = segs.is_obstacle & ~claimed                    # (S,)
    free = ~upd.valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1      # (T,)
    obj_rank = jnp.cumsum(insert.astype(jnp.int32)) - 1     # (S,)
    sel = (free[:, None] & insert[None, :]
           & (free_rank[:, None] == obj_rank[None, :]))     # (T, S)
    inserted = jnp.any(sel, axis=1)                         # (T,)
    ins = _exact_select(
        sel.astype(upd.pos.dtype),
        jnp.concatenate([segs.center_pos, segs.center_dist[:, None]],
                        axis=-1).astype(upd.pos.dtype))     # (T, 3)
    ins_pos, ins_dist = ins[:, :2], ins[:, 2]

    def merge(old, ins_vals):
        mask = inserted if old.ndim == 1 else inserted[:, None]
        return jnp.where(mask, ins_vals.astype(old.dtype), old)

    return TrackState(
        valid=upd.valid | inserted,
        pos=merge(upd.pos, ins_pos),
        prev_pos=merge(upd.prev_pos, ins_pos),
        has_prev=jnp.where(inserted, False, upd.has_prev),
        dist=merge(upd.dist, ins_dist),
        # fresh tracks carry the reference's -1 velocity sentinel (:667),
        # which flows into the closing speed and inflates CP for
        # just-appeared obstacles — reproduced deliberately.
        speed=jnp.where(inserted, -1.0, upd.speed),
        vel=jnp.where(inserted[:, None], 0.0, upd.vel),
    )


def collision_probabilities(cfg: EnvConfig, tracks: TrackState,
                            robot_pos, robot_prev_pos):
    """Stage 7: collision-cone TTC -> CP per track (:765-860)."""
    agent_speed = jnp.linalg.norm(robot_pos - robot_prev_pos) / cfg.dt

    if cfg.strict_quirks:
        # the reference divides every track's TTC by the *first* track's
        # closing speed (obstacle_vel = obstacle_vel[0], :793)
        first = jnp.argmax(tracks.valid)
        obs_speed = jnp.where(jnp.any(tracks.valid), tracks.speed[first], 0.0)
        obs_speed = jnp.broadcast_to(obs_speed, tracks.speed.shape)
    else:
        obs_speed = tracks.speed

    # resultant motion line: from the previous robot position toward the
    # current position shifted by the obstacle's (prev - curr) displacement
    # (:798-815); per-track here (the reference reuses the loop-final shift)
    vo_shift = (tracks.prev_pos - tracks.pos) * tracks.has_prev[:, None]
    target = robot_pos[None, :] + vo_shift
    rel = target - robot_prev_pos[None, :]
    norm = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    u = rel / jnp.maximum(norm, 1e-9)
    dist_cp = geom.line_circle_min_distance(
        robot_prev_pos[None, :], u, tracks.pos, cfg.collision_body_width)
    hit = jnp.isfinite(dist_cp)

    resultant = agent_speed - obs_speed
    still = resultant == 0.0
    ttc = dist_cp / jnp.where(still, 1.0, resultant)
    cp_ttc = geom.collision_prob_ttc(ttc, hit & ~still)
    gcp = geom.collision_prob_distance(tracks.dist, cfg.max_scan_range,
                                       cfg.min_scan_range)
    # hit & moving: weighted mix; hit & still: distance-only at full weight
    # (:830-833); miss: TTC term is zero (:849-855)
    cp = jnp.where(
        hit & still, gcp,
        cfg.cp_ttc_weight * cp_ttc + cfg.cp_dist_weight * gcp)
    cp = jnp.where(tracks.valid, cp, 0.0)
    ego = jnp.where(tracks.valid & hit & ~still, cp_ttc, 0.0)
    return cp, ego


def select_top_k(cfg: EnvConfig, tracks: TrackState, cp, live, robot_pos):
    """Stage 8: CP-ranked top-K slot selection + robot-pose padding
    (:878-905). Returns (top_cp (K,), top_pose_vel (K, 4)).

    Default keeps the K *highest*-CP tracks; ``strict_quirks`` reproduces
    the reference's ``sorted(desc)[-K:]`` slice, which keeps the LOWEST K
    whenever more than K tracks exist (:882-883)."""
    K = cfg.k_obstacles
    if cfg.strict_quirks:
        n_valid = jnp.sum(tracks.valid.astype(jnp.int32))
        overflow = n_valid > K
        score = jnp.where(tracks.valid,
                          jnp.where(overflow, -cp, cp), -jnp.inf)
    else:
        score = jnp.where(tracks.valid, cp, -jnp.inf)
    top_cp, top_idx = jax.lax.top_k(score, K)
    if cfg.strict_quirks:
        # `sorted(desc)[-K:]` keeps the slice in DESCENDING cp order even
        # though it selects the lowest-K set (:882-883); top_k over -cp
        # returns ascending cp, so re-sort the picked entries
        order = jnp.argsort(-jnp.where(jnp.isfinite(top_cp), cp[top_idx],
                                       -jnp.inf), stable=True)
        top_cp = top_cp[order]
        top_idx = top_idx[order]
    picked_valid = live & jnp.isfinite(top_cp)
    # one-hot matmuls instead of [top_idx] gathers (TPU gather pathology —
    # see segment_scans center_oh comment)
    T = tracks.valid.shape[0]
    top_oh = (top_idx[:, None] == jnp.arange(T)[None, :]) \
        .astype(jnp.float32)                                # (K, T)
    top_cp = jnp.where(picked_valid, _exact_select(top_oh, cp), 0.0)
    pad = jnp.concatenate([robot_pos, jnp.zeros(2, robot_pos.dtype)])
    entries = jnp.concatenate([_exact_select(top_oh, tracks.pos),
                               _exact_select(top_oh, tracks.vel)],
                              axis=-1)
    top_pose_vel = jnp.where(picked_valid[:, None], entries, pad[None, :])
    return top_cp, top_pose_vel


def perceive(cfg: EnvConfig, scans, points, tracks: TrackState,
             robot_pos, robot_prev_pos, compute_cp=True,
             yaw=None) -> RiskOutput:
    """Full pipeline for one env. ``compute_cp=False`` reproduces the reset
    path where the agent pose deque has a single entry and the CP block is
    skipped (:769). ``yaw`` additionally fills ``segment_regions``."""
    segs = segment_scans(cfg, scans, points)
    new_tracks = update_tracks(cfg, tracks, segs)

    obstacle_seen = jnp.any(segs.is_obstacle)
    ego_violation = jnp.any(segs.is_obstacle
                            & (segs.center_dist < cfg.ego_distance_threshold))

    cp, ego = collision_probabilities(cfg, new_tracks, robot_pos,
                                      robot_prev_pos)
    any_track = jnp.any(new_tracks.valid)
    live = compute_cp & any_track

    top_cp, top_pose_vel = select_top_k(cfg, new_tracks, cp, live, robot_pos)
    # within the picked set the reference reports the max CP (:885)
    cp_max = jnp.where(live, jnp.max(top_cp), 0.0)
    ego_cp = jnp.where(live, jnp.max(jnp.where(new_tracks.valid, ego, 0.0)),
                       0.0)

    regions = None
    if yaw is not None:
        regions = jnp.where(
            segs.valid, geom.social_region(robot_pos, yaw, segs.center_pos,
                                           segs.center_dist), 0)
    return RiskOutput(tracks=new_tracks, top_k_pose_vel=top_pose_vel,
                      top_k_cp=top_cp, cp_max=cp_max, ego_cp=ego_cp,
                      obstacle_seen=obstacle_seen,
                      ego_violation=ego_violation, segments=segs,
                      segment_regions=regions)
