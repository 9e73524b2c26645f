"""Typed, hashable configuration tree for the environment engine.

Replaces the reference's two-tier YAML -> ROS-param-server config
(`turtlebot3_rl_sim/launch/*.launch`, `src/configs/*.yaml`, read at
`start_td3_training.py:56-61`) plus its scattered hardcoded constants
(0.15 s step `environment_stage_1_nobonus.py:1201`, ego threshold 0.140
`:1000`, social threshold 0.4 `:1004`, waypoint radius 0.3 `:250`,
goal box 0.2 `:1285-1301`).

Everything here is a frozen dataclass of static Python values (hashable),
so an ``EnvConfig`` can be closed over by ``jax.jit`` without retracing.

World geometry comes from the Gazebo worlds
(`turtlebot3_gazebo/worlds/turtlebot3_crowd_{none,sparse,dense}.world`,
3x3 m room, walls ``3 0.1 0.3``; test worlds
`test_environment/turtlebot3_obstacle_{4,8,12,20}.world`, 5x5 m room).
Crowd behaviors come from the 34 `crowd_behaviors/simulate_*.py` scripts,
distilled into per-pedestrian direction tables + redraw windows.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Tuple

Vec2 = Tuple[float, float]


class CrowdBehavior(enum.IntEnum):
    """Pedestrian driving pattern families (`crowd_behaviors/simulate_*.py`)."""

    STATIC = 0     # obstacles never move (turtlebot3_crowd_none-style)
    RANDOM = 1     # fresh uniform velocity each window (simulate_random_*.py,
                   # simulate_crowd.py)
    CROSSING = 2   # fixed perpendicular patterns (simulate_crossing_*.py)
    TOWARDS = 3    # aimed at the robot's side (simulate_towards_*.py)
    AHEAD = 4      # parallel to robot path (simulate_ahead_*.py)


# Fixed unit-direction tables per (family, pedestrian-count), transcribed from
# the move_model calls of the corresponding scripts (e.g.
# simulate_crossing_4.py:88-92, simulate_towards_20.py:110-140,
# simulate_ahead_12.py:104-115). Velocity = direction * speed.
_DIR_TABLES = {
    (CrowdBehavior.CROSSING, 4): ((1, 1), (0, 1), (0, -1), (0, -1)),
    (CrowdBehavior.CROSSING, 8): ((1, 1), (0, 1), (1, 1), (0, 1),
                                  (0, -1), (0, -1), (0, -1), (-1, -1)),
    (CrowdBehavior.CROSSING, 12): ((1, 1), (0, 1), (0, 1), (1, 1), (0, 1),
                                   (-1, 1), (0, -1), (-1, -1), (0, -1),
                                   (0, -1), (0, -1), (-1, -1)),
    (CrowdBehavior.CROSSING, 20): ((1, 1), (0, 1), (0, 1), (1, 1), (0, 1),
                                   (-1, 1), (0, -1), (-1, -1), (0, -1),
                                   (0, -1), (0, -1), (-1, -1), (0, 1),
                                   (-1, -1), (-1, -1), (1, 1), (1, 1),
                                   (1, -1), (1, -1), (0, 1)),
    (CrowdBehavior.TOWARDS, 4): ((1, 1), (1, 0), (1, -1), (1, -1)),
    (CrowdBehavior.TOWARDS, 8): ((1, 1), (1, 1), (1, 1), (1, 0),
                                 (1, -1), (1, -1), (1, -1), (1, -1)),
    (CrowdBehavior.TOWARDS, 12): ((1, 1), (1, 1), (1, 1), (1, 1), (1, 0),
                                  (1, 1), (1, -1), (1, -1), (1, -1),
                                  (1, -1), (1, -1), (1, -1)),
    (CrowdBehavior.TOWARDS, 20): ((1, 1), (1, 1), (1, 1), (1, 1), (1, 0),
                                  (1, 1), (1, -1), (1, -1), (1, -1),
                                  (1, -1), (1, -1), (1, -1), (1, 1),
                                  (1, -1), (1, -1), (1, 0), (1, 1),
                                  (1, 0), (1, -1), (1, 1)),
    (CrowdBehavior.AHEAD, 4): ((0, 1), (-1, 0), (0, -1), (-1, -1)),
    (CrowdBehavior.AHEAD, 8): ((0, 1), (-1, 1), (0, 1), (-1, 0),
                               (0, -1), (0, -1), (-1, -1), (-1, -1)),
    (CrowdBehavior.AHEAD, 12): ((0, 1), (-1, 1), (-1, 1), (0, 1), (-1, 0),
                                (-1, 0), (0, -1), (-1, 0), (0, -1),
                                (-1, -1), (-1, -1), (-1, -1)),
    (CrowdBehavior.AHEAD, 20): ((0, 1), (-1, 1), (-1, 1), (0, 1), (-1, 0),
                                (-1, 0), (0, -1), (-1, 0), (0, -1),
                                (-1, -1), (-1, -1), (-1, -1), (-1, 1),
                                (-1, 0), (-1, 0), (1, 1), (1, 1),
                                (1, -1), (1, -1), (-1, 1)),
}


def crowd_direction_table(behavior: CrowdBehavior, n_peds: int):
    """Per-pedestrian unit direction tuple for fixed-pattern behaviors."""
    if behavior in (CrowdBehavior.STATIC, CrowdBehavior.RANDOM):
        return tuple((0.0, 0.0) for _ in range(n_peds))
    key = (behavior, n_peds)
    if key in _DIR_TABLES:
        return _DIR_TABLES[key]
    # Fall back to cycling the largest table of the family.
    base = _DIR_TABLES[(behavior, 20)]
    return tuple(base[i % len(base)] for i in range(n_peds))


# Initial pedestrian poses, from the world files (see module docstring).
_DENSE_PEDS = ((-0.01, -1.0), (-1.15, -0.3), (-0.32, -0.12), (-0.85, 0.92),
               (0.94, 0.99), (0.65, 0.2), (0.22, 0.54), (0.22, 0.54),
               (0.22, 0.54), (0.22, 0.54), (0.22, 0.54), (0.22, 0.54),
               (0.22, 0.54), (0.22, 0.54))
_SPARSE_PEDS = ((-0.01, -1.0), (-1.15, -0.3), (-0.32, -0.12), (-0.85, 0.92),
                (0.65, 0.2), (0.22, 0.54))
# 20 pedestrians in the 3x3 training room: the dense-world spawns extended
# the way the dense world itself piles extras — obstacles 8-14 all spawn at
# (0.22, 0.54) (turtlebot3_crowd_dense.world:86-925) and only separate once
# driven; eval uses jitter so the stack disperses at reset. This world has
# no reference counterpart (the reference never runs 20 peds in the 3x3
# room) — it is the "harder than published" probe suite for the risk
# ablation (VERDICT r4 item 1).
_DENSE20_PEDS = _DENSE_PEDS + tuple((0.22, 0.54) for _ in range(6))
# Test worlds list obstacles in script-driving order (obstacle_<i> ascending
# subset; the simulate_*_{4,8,12,20}.py scripts address them in this order).
_TEST4_PEDS = ((-1.28, -0.75), (-0.66, -0.86), (-1.46, 1.29), (-0.48, 1.28))
_TEST8_PEDS = ((-1.6, -1.3), (-0.27, -1.47), (-1.28, -0.75), (-0.66, -0.86),
               (-1.63, 0.67), (-1.46, 1.29), (-0.48, 1.28), (0.056, 0.73))
_TEST12_PEDS = ((-1.6, -1.3), (-1.0, -1.5), (-0.27, -1.47), (-1.28, -0.75),
                (-0.66, -0.86), (0.10, -0.81), (-1.63, 0.67), (-0.38, 0.45),
                (-1.46, 1.29), (-0.93, 0.76), (-0.48, 1.28), (0.056, 0.73))
_TEST20_PEDS = _TEST12_PEDS + ((0.310203, -1.50737), (0.422808, 0.415746),
                               (0.676179, 1.21299), (-1.80625, -0.688364),
                               (-2.00363, -1.5338), (-2.01729, 0.696956),
                               (-2.05112, 1.57537), (0.537473, -0.824292))


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment parameters (hashable; safe to close over in jit)."""

    # --- lidar (turtlebot3_burger.gazebo.xacro:150-177, modified sensor) ---
    n_beams: int = 360            # raw beams; observation uses n_beams - 1
    max_scan_range: float = 0.6   # clip + "free space" value
    lidar_min_range: float = 0.08
    min_scan_range: float = 0.12  # collision termination threshold
                                  # (configs/turtlebot3_world.yaml:11; 0.0 in eval)

    # --- robot (turtlebot3_fake.cpp:41-46, burger) ---
    wheel_separation: float = 0.160
    wheel_radius: float = 0.033
    robot_radius: float = 0.105
    collision_body_width: float = 0.178   # collision-cone circle radius
                                          # (environment_stage_1_nobonus.py:823)
    max_lin_vel: float = 0.22
    max_ang_vel: float = 2.0
    dt: float = 0.15              # fixed sim step; replaces the wall-clock
                                  # sleep (environment_stage_1_nobonus.py:1201)

    # --- room (worlds/*.world) ---
    room_size: float = 3.0        # outer wall length; 5.0 for test worlds
    wall_thickness: float = 0.1

    # --- crowd ---
    n_peds: int = 14
    ped_radius: float = 0.0505    # cylinder radius (crowd_dense.world:108-119)
    ped_init: Tuple[Vec2, ...] = _DENSE_PEDS
    behavior: CrowdBehavior = CrowdBehavior.RANDOM
    crowd_speed: float = 0.2      # simulate_crowd.py:101-102
    redraw_window_steps: int = 1  # velocity redraw cadence, in env steps

    # --- task (configs/turtlebot3_world.yaml) ---
    start_pose: Tuple[float, float, float] = (0.75, -0.75, math.pi)
    goal: Vec2 = (-1.0, 1.0)
    max_steps: int = 1000
    goal_eps: float = 0.2         # desired-position box half-size (:1285-1301)
    waypoint_radius: float = 0.3  # local-goal FOV circle (:250)

    use_waypoints: bool = True    # False = realworld variant (goal direct,
                                  # environment_stage_1_nobonus_realworld.py)

    # --- reset randomization (new-framework obligation) ---
    # The reference gets episode diversity for free from Gazebo physics
    # noise / wall-clock jitter; a deterministic batched engine must inject
    # it explicitly or every env in the batch is bit-identical for fixed-
    # pattern behaviors (and eval "n=256" collapses to n=1). All seeded from
    # the reset key; zero = deterministic template spawn.
    start_pos_jitter: float = 0.0   # uniform +- (m) on the spawn x, y
    start_yaw_jitter: float = 0.0   # uniform +- (rad) on the spawn yaw
    ped_pos_jitter: float = 0.0     # uniform +- (m) per pedestrian spawn
    ped_shuffle: bool = False       # permute the direction table per env
    ped_phase_jitter: bool = False  # random redraw-window phase per env

    # --- per-step stochasticity (VERDICT r3 missing item 2) ---
    # The reference's episode-to-episode variation does not stop at reset:
    # Gazebo steps 1 ms ODE contact physics between actions
    # (worlds/turtlebot3_crowd_dense.world:69-71) under wall-clock
    # scheduling jitter (the 0.15 s sleep + padding,
    # environment_stage_1_nobonus.py:1198-1205), and the lidar plugin
    # carries a Gaussian-noise field (set to 0.0 in the shipped xacro,
    # turtlebot3_burger.gazebo.xacro:150-177). A fixed-dt kinematic engine
    # has none of that; these knobs inject each axis explicitly so the
    # "Gazebo noise explains the reference's no_cp collapse" hypothesis is
    # testable (results/r3 ablation post-mortem):
    actuation_noise: float = 0.0  # Gaussian std on the executed (lin, ang)
                                  # command, as a fraction of
                                  # (max_lin_vel, max_ang_vel)
    dt_jitter: float = 0.0        # uniform +-fraction on the physics dt;
                                  # the risk tracker keeps dividing by the
                                  # nominal dt (it cannot observe the true
                                  # elapsed time), so this also perturbs
                                  # velocity estimates — as the reference's
                                  # measured-wall-time division does
    lidar_noise: float = 0.0      # Gaussian std (m) per beam range (the
                                  # plugin's disabled noise field)

    # --- state ablation (results/td3/{ablation_study,revamped} arms) ---
    # The reference toggles state components via commented code (the "no CP"
    # state `environment_stage_1_nobonus.py:1032-1033`, CP weights "original:
    # 0.5, 0.5 (before ablation)" `:838-842`); the arms live on only as
    # result-directory names. Here they are explicit config:
    #   "full"      359 scans + [htg,dtg] + [x,y] + [yaw] + [vx,vy] + 4K
    #   "no_cp"     same dims, top-K block frozen to the robot-pose padding
    #               [x, y, 0, 0] * K (:1032-1033)
    #   "basic"     359 scans + [htg,dtg] + [x,y]           (363; the
    #               ablation_study/basic arm == the simple-env state,
    #               environment_stage_1_original.py:315-320)
    #   "basic_grp" basic + [goal_reaching_prob]            (364; the
    #               grp block :968-988, computed-but-unused in the main arm)
    # CP-weight arms (basic_grp_cp = TTC-only CP, *_gcp / no_cpdto = mixed)
    # are reached through cp_ttc_weight / cp_dist_weight — see
    # ABLATION_PRESETS.
    state_variant: str = "full"

    # --- lidar compute backend ---
    # "xla": the fused broadcast/reduce raycast (ops/lidar.py) under vmap;
    # "pallas": the hand-tiled VMEM kernel (ops/lidar_pallas.py) via the
    # batched step path (CrowdEnv.step_batch). Numerics identical.
    lidar_backend: str = "xla"

    # --- social-region debug output ---
    # The reference computes FRF/FLF/FRC/FLC region codes per scan point
    # every step (:296-305) and then barely uses them (debug / social-nav
    # bookkeeping). The TPU engine keeps that work OFF the training hot
    # path by default: regions land in RiskOutput.segment_regions only
    # when this flag is set (viz, parity tests, deployment debugging).
    compute_regions: bool = False

    # --- risk compute backend ---
    # "xla": the fixed-shape ops in ops/risk.py under vmap;
    # "pallas": the fused tracker+CP+topK VMEM kernel
    # (ops/risk_pallas.py) via CrowdEnv.step_batch — the perceive chain's
    # ~30 fused XLA kernels collapse into one program per 128-env tile.
    # Default-quirks only (strict_quirks requires "xla").
    risk_backend: str = "xla"

    # --- perceived risk (environment_stage_1_nobonus.py) ---
    k_obstacles: int = 8          # top-K CP slots in the state (:55)
    max_segments: int = 32        # fixed-shape cap on lidar segments
    max_tracks: int = 24          # fixed-shape cap on tracked obstacles
    min_segment_scans: int = 4    # segments below this are dropped (:573-575)
    ego_distance_threshold: float = 0.140   # ego violation distance (:1000)
    social_cp_threshold: float = 0.4        # social violation CP (:1004)
    cp_ttc_weight: float = 0.5    # CP mixing weights (:838-842)
    cp_dist_weight: float = 0.5
    grad_round_decimals: int = 3  # gradient rounding (:346)

    # --- reward (compute_reward :1046-1162) ---
    step_penalty: float = -2.0
    dtg_reward: float = 1.0
    htg_reward: float = 1.0
    waypoint_reward: float = 200.0
    goal_reward: float = 200.0
    collision_reward: float = -200.0

    # Reproduce committed reference quirks bit-for-bit where they change
    # numerics (SURVEY.md §7 "reference quirks policy"). False = intended
    # semantics (documented per-site).
    strict_quirks: bool = False

    # Cross-episode statefulness quirk (SURVEY.md §7 hard-part 3): the
    # reference's `reset` does NOT clear the obstacle tracker dict or the
    # waypoint — both survive into the next episode
    # (`environment_stage_1_nobonus.py:1227-1263` clears only counters).
    # False (default) = reset-clean; True = carry tracker + waypoint
    # through auto-resets per env, like the reference.
    persist_tracks_across_reset: bool = False

    @property
    def n_scans(self) -> int:
        """Observation scan count: the last beam duplicates the first and is
        dropped (`utils.get_scan_ranges:389-391`)."""
        return self.n_beams - 1

    @property
    def room_half_inner(self) -> float:
        """Half-size of the free interior (inner wall faces)."""
        return self.room_size / 2.0 - self.wall_thickness / 2.0

    @property
    def state_dim_risk(self) -> int:
        """Perceived-risk state dimension for the configured variant.

        "full"/"no_cp": 359 scans + [htg, dtg] + [x, y] + [yaw] + [vx, vy]
        + 4K obstacle pose/vel (:1038-1039) = 366 + 4K. Ablation arms drop
        blocks (see ``state_variant``)."""
        if self.state_variant == "basic":
            return self.n_scans + 4
        if self.state_variant == "basic_grp":
            return self.n_scans + 5
        return self.n_scans + 7 + 4 * self.k_obstacles

    @property
    def state_dim_simple(self) -> int:
        """Simple state: 359 scans + [htg, dtg] + [x, y]
        (environment_stage_1_original.py:315-320)."""
        return self.n_scans + 4

    def direction_table(self):
        return crowd_direction_table(self.behavior, self.n_peds)


WORLD_PRESETS = {
    # training worlds (3x3 room, start (0.75,-0.75) yaw pi, goal (-1,1))
    "crowd_none": dict(n_peds=0, ped_init=(), behavior=CrowdBehavior.STATIC),
    "crowd_sparse": dict(n_peds=6, ped_init=_SPARSE_PEDS),
    "crowd_dense": dict(n_peds=14, ped_init=_DENSE_PEDS),
    # harder-than-published probe world: 20 peds in the 3x3 training room
    # (collisions terminate; see _DENSE20_PEDS note)
    "crowd_20": dict(n_peds=20, ped_init=_DENSE20_PEDS),
    # evaluation worlds (5x5 room, start (1,0) yaw pi, goal (-2,2),
    # min_scan_range 0 so collisions don't truncate — README.md:66-68)
    "test_4": dict(n_peds=4, ped_init=_TEST4_PEDS, room_size=5.0,
                   start_pose=(1.0, 0.0, math.pi), goal=(-2.0, 2.0),
                   min_scan_range=0.0),
    "test_8": dict(n_peds=8, ped_init=_TEST8_PEDS, room_size=5.0,
                   start_pose=(1.0, 0.0, math.pi), goal=(-2.0, 2.0),
                   min_scan_range=0.0),
    "test_12": dict(n_peds=12, ped_init=_TEST12_PEDS, room_size=5.0,
                    start_pose=(1.0, 0.0, math.pi), goal=(-2.0, 2.0),
                    min_scan_range=0.0),
    "test_20": dict(n_peds=20, ped_init=_TEST20_PEDS, room_size=5.0,
                    start_pose=(1.0, 0.0, math.pi), goal=(-2.0, 2.0),
                    min_scan_range=0.0),
    # hardware-deployment shape: 370-dim state, single closest obstacle,
    # no waypointing (environment_stage_1_nobonus_realworld.py:736-746,
    # start_td3_real_world_test.py:60)
    "realworld": dict(n_peds=1, ped_init=((0.3, 0.3),), k_obstacles=1,
                      use_waypoints=False),
    # The classic `turtlebot3_world` obstacle course: nine static pillars
    # (radius 0.15) on the 3x3 grid at {-1.1, 0, 1.1}^2
    # (turtlebot3_gazebo/models/turtlebot3_world/model.sdf, collisions
    # one_one..three_three), modeled as zero-speed "pedestrians". The
    # outer boundary is a SQUARE stand-in sized to the hexagon's ~4.4 m
    # span — the engine's raycast is a closed-form axis-aligned box
    # (ops/lidar.py:_box_inside), deliberately not generalized to polygon
    # walls (hot-path op); beams that reach the boundary differ from the
    # Gazebo hexagon, pillar returns match.
    "turtlebot3_world_pillars": dict(
        n_peds=9,
        ped_init=tuple((x, y) for x in (-1.1, 0.0, 1.1)
                       for y in (-1.1, 0.0, 1.1)),
        behavior=CrowdBehavior.STATIC, ped_radius=0.15,
        room_size=4.4, start_pose=(1.8, -1.8, math.pi), goal=(-1.8, 1.8)),
}

# Robot kinematic variants from `turtlebot3_description/urdf/*.xacro`.
# The reference trains and evaluates exclusively on its MODIFIED burger
# (lidar clipped to 0.6 m, min 0.08 — turtlebot3_burger.gazebo.xacro:
# 157-165); the other URDFs in its tree are carried here as kinematic
# presets so a user of the reference finds every robot variant:
#
# - waffle: wheelSeparation 0.287, wheelDiameter 0.066
#   (turtlebot3_waffle.gazebo.xacro:24-25); base collision box
#   0.265x0.265 (turtlebot3_waffle.urdf.xacro:31-35) -> circumscribed
#   radius 0.187; overall width incl. wheels = separation + tire width
#   0.018 = 0.305 (wheel collision cylinders, urdf.xacro:61-65);
#   UNMODIFIED LDS-01 lidar: min 0.120, max 3.5
#   (turtlebot3_waffle.gazebo.xacro:130-131). The reference defines no
#   waffle-specific velocity caps, so the burger caps carry over —
#   override max_lin_vel/max_ang_vel explicitly if needed.
# - burger2: burger + a D435 camera bolted on
#   (turtlebot3_burger2.urdf.xacro:49-52) — kinematically identical.
# - waffle_naked: waffle with the stripped mesh/sensor set
#   (turtlebot3_waffle_naked.urdf.xacro) — kinematically identical.
_WAFFLE = dict(wheel_separation=0.287, robot_radius=0.187,
               collision_body_width=0.305,
               lidar_min_range=0.120, max_scan_range=3.5)
ROBOT_PRESETS = {
    "burger": {},          # EnvConfig defaults (the reference's sim robot)
    "burger2": {},
    "waffle": _WAFFLE,
    "waffle_naked": _WAFFLE,
}

# Ablation arms, named after the result directories
# `results/td3/ablation_study/{basic,basic_grp,basic_grp_cp,basic_grp_cp_gcp}`
# and `results/td3/revamped/...{_no_cp,_no_cpdto}` (SURVEY.md §4, §6). The
# state compositions are reconstructed from the commented toggles
# (`environment_stage_1_nobonus.py:1032-1033` no-CP state, `:838-842` CP
# weights, `:968-988` grp block); exact historical dims are not recoverable
# from the reference (only the CSVs survive), so arms are documented config,
# not bit-parity claims.
ABLATION_PRESETS = {
    "basic": dict(state_variant="basic"),
    "basic_grp": dict(state_variant="basic_grp"),
    # TTC-only collision probability (distance term ablated away)
    "basic_grp_cp": dict(cp_ttc_weight=1.0, cp_dist_weight=0.0),
    # the published main arm: mixed TTC + distance CP
    "basic_grp_cp_gcp": dict(),
    # revamped arms: CP block removed from the state / distance term removed
    "no_cp": dict(state_variant="no_cp"),
    "no_cpdto": dict(cp_ttc_weight=1.0, cp_dist_weight=0.0),
}


# Behavior presets: (behavior, speed, redraw window in seconds), from the
# crowd_behaviors scripts (speeds: *_4/8/12 0.1, *_fast 0.2, *_20 0.04,
# random_4/8/12 ±0.1, random_20 ±0.04 window 11.25 s, crowd ±0.2).
BEHAVIOR_PRESETS = {
    "static": (CrowdBehavior.STATIC, 0.0, 1.0),
    "crowd": (CrowdBehavior.RANDOM, 0.2, 0.15),
    "crowd_highspeed": (CrowdBehavior.RANDOM, 0.5, 0.15),
    "random": (CrowdBehavior.RANDOM, 0.1, 2.25),
    "random_fast": (CrowdBehavior.RANDOM, 0.2, 2.25),
    "random_20": (CrowdBehavior.RANDOM, 0.04, 11.25),
    "crossing": (CrowdBehavior.CROSSING, 0.1, 1.0),
    "crossing_fast": (CrowdBehavior.CROSSING, 0.2, 1.0),
    "crossing_20": (CrowdBehavior.CROSSING, 0.04, 1.0),
    "towards": (CrowdBehavior.TOWARDS, 0.1, 1.0),
    "towards_fast": (CrowdBehavior.TOWARDS, 0.2, 1.0),
    "towards_20": (CrowdBehavior.TOWARDS, 0.04, 1.0),
    "ahead": (CrowdBehavior.AHEAD, 0.1, 1.0),
    "ahead_fast": (CrowdBehavior.AHEAD, 0.2, 1.0),
    "ahead_20": (CrowdBehavior.AHEAD, 0.04, 1.0),
}


def make_config(world: str = "crowd_dense", behavior: str | None = None,
                ablation: str | None = None, jitter: float = 0.0,
                robot: str | None = None,
                **overrides) -> EnvConfig:
    """Build an ``EnvConfig`` from a world preset + behavior preset
    (+ optional ablation arm).

    ``make_config("test_20", "crossing_20")`` reproduces the paper's
    20-pedestrian crossing evaluation scenario (README.md:82-89);
    ``make_config("crowd_dense", ablation="no_cp")`` reproduces the
    CP-removed ablation arm.
    """
    kw = dict(WORLD_PRESETS[world])
    if behavior is not None:
        beh, speed, window = BEHAVIOR_PRESETS[behavior]
        kw.update(behavior=beh, crowd_speed=speed)
        dt = overrides.get("dt", EnvConfig.dt)
        kw.update(redraw_window_steps=max(1, round(window / dt)))
    if ablation is not None:
        kw.update(ABLATION_PRESETS[ablation])
    if robot is not None:
        kw.update(ROBOT_PRESETS[robot])
    if jitter:
        # one knob scaling all reset-randomization magnitudes
        kw.update(start_pos_jitter=0.15 * jitter,
                  start_yaw_jitter=0.5 * jitter,
                  ped_pos_jitter=0.2 * jitter,
                  ped_shuffle=True, ped_phase_jitter=True)
    kw.update(overrides)
    return EnvConfig(**kw)
