"""Native (C++) runtime components, bound via ctypes.

The reference ships C++ for its Gazebo-free robot simulator and scripted
controller (SURVEY.md §2.5); here `fastsim.cpp` is the native counterpart
of the TPU engine's world model — same kinematics, same raycast — compiled
on demand with g++ and exposed through a zero-copy ctypes ABI. It backs
robot-side deployment loops (no JAX on the robot) and serves as a third
independent implementation for parity testing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastsim.cpp")
_SO = os.path.join(_DIR, "libfastsim.so")

MAX_PEDS = 64


class _Config(ctypes.Structure):
    _fields_ = [
        ("n_scans", ctypes.c_int32), ("n_peds", ctypes.c_int32),
        ("dt", ctypes.c_float), ("wheel_separation", ctypes.c_float),
        ("wheel_radius", ctypes.c_float), ("robot_radius", ctypes.c_float),
        ("ped_radius", ctypes.c_float), ("room_half_inner", ctypes.c_float),
        ("max_scan_range", ctypes.c_float),
        ("lidar_min_range", ctypes.c_float),
        ("goal_x", ctypes.c_float), ("goal_y", ctypes.c_float),
        ("goal_eps", ctypes.c_float), ("min_scan_range", ctypes.c_float),
        ("max_steps", ctypes.c_int32),
    ]


class _State(ctypes.Structure):
    _fields_ = [
        ("x", ctypes.c_float), ("y", ctypes.c_float),
        ("yaw", ctypes.c_float),
        ("prev_x", ctypes.c_float), ("prev_y", ctypes.c_float),
        ("step", ctypes.c_int32), ("done", ctypes.c_int32),
        ("peds", ctypes.c_float * (2 * MAX_PEDS)),
    ]


class _BatchConfig(ctypes.Structure):
    _fields_ = [
        ("base", _Config),
        ("n_envs", ctypes.c_int32),
        ("behavior", ctypes.c_int32),
        ("crowd_speed", ctypes.c_float),
        ("redraw_window", ctypes.c_int32),
        ("start_x", ctypes.c_float), ("start_y", ctypes.c_float),
        ("start_yaw", ctypes.c_float),
        ("start_pos_jitter", ctypes.c_float),
        ("start_yaw_jitter", ctypes.c_float),
        ("ped_pos_jitter", ctypes.c_float),
        ("ped_init", ctypes.POINTER(ctypes.c_float)),
        ("ped_dirs", ctypes.POINTER(ctypes.c_float)),
    ]


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True)
    return _SO


_lib = None


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        fp = ctypes.POINTER(ctypes.c_float)
        _lib.fastsim_integrate.argtypes = [ctypes.POINTER(_Config),
                                           ctypes.POINTER(_State),
                                           ctypes.c_float, ctypes.c_float]
        _lib.fastsim_scan.argtypes = [ctypes.POINTER(_Config),
                                      ctypes.POINTER(_State), fp]
        _lib.fastsim_step.argtypes = [ctypes.POINTER(_Config),
                                      ctypes.POINTER(_State),
                                      ctypes.c_float, ctypes.c_float, fp, fp]
        _lib.fastsim_step.restype = ctypes.c_int32
        _lib.fastsim_rollout.argtypes = [ctypes.POINTER(_Config),
                                         ctypes.POINTER(_State), fp,
                                         ctypes.c_int32, fp, fp, fp]
        _lib.fastsim_rollout.restype = ctypes.c_int32
        ip = ctypes.POINTER(ctypes.c_int32)
        up = ctypes.POINTER(ctypes.c_uint64)
        soa = [ctypes.POINTER(_BatchConfig),
               fp, fp, fp, fp, fp, ip, ip, fp, fp, up]
        _lib.fastsim_reset_batch.argtypes = soa
        _lib.fastsim_step_batch.argtypes = soa + [fp, fp]
    return _lib


def _fp(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class FastSim:
    """Native single-env simulator mirroring ``crowdnav_tpu.envs.world``."""

    def __init__(self, cfg):
        if cfg.n_peds > MAX_PEDS:
            raise ValueError(f"fastsim supports <= {MAX_PEDS} pedestrians")
        self._lib = _load()
        self._cfg = _Config(
            n_scans=cfg.n_scans, n_peds=cfg.n_peds, dt=cfg.dt,
            wheel_separation=cfg.wheel_separation,
            wheel_radius=cfg.wheel_radius, robot_radius=cfg.robot_radius,
            ped_radius=cfg.ped_radius, room_half_inner=cfg.room_half_inner,
            max_scan_range=cfg.max_scan_range,
            lidar_min_range=cfg.lidar_min_range,
            goal_x=cfg.goal[0], goal_y=cfg.goal[1], goal_eps=cfg.goal_eps,
            min_scan_range=cfg.min_scan_range, max_steps=cfg.max_steps)
        self.cfg = cfg
        self.reset()

    def reset(self):
        self._st = _State()
        self._st.x, self._st.y, self._st.yaw = self.cfg.start_pose
        self._st.prev_x, self._st.prev_y = self.cfg.start_pose[:2]
        peds = np.zeros(2 * MAX_PEDS, np.float32)
        if self.cfg.n_peds:
            peds[:2 * self.cfg.n_peds] = np.asarray(
                self.cfg.ped_init, np.float32).ravel()
        self._st.peds = (ctypes.c_float * (2 * MAX_PEDS))(*peds)

    @property
    def pose(self):
        return np.array([self._st.x, self._st.y, self._st.yaw], np.float32)

    @property
    def done(self) -> int:
        return int(self._st.done)

    def scan(self) -> np.ndarray:
        out = np.empty(self.cfg.n_scans, np.float32)
        self._lib.fastsim_scan(ctypes.byref(self._cfg),
                               ctypes.byref(self._st), _fp(out))
        return out

    def step(self, lin: float, ang: float, ped_vel=None):
        scan = np.empty(self.cfg.n_scans, np.float32)
        pv = (np.ascontiguousarray(ped_vel, np.float32)
              if ped_vel is not None else None)
        done = self._lib.fastsim_step(
            ctypes.byref(self._cfg), ctypes.byref(self._st),
            ctypes.c_float(lin), ctypes.c_float(ang),
            _fp(pv) if pv is not None else None, _fp(scan))
        return scan, int(done)

    def rollout(self, actions: np.ndarray, ped_vels=None):
        """actions (T, 2) -> trajectory (n, 3) of (x, y, yaw)."""
        actions = np.ascontiguousarray(actions, np.float32)
        n_steps = actions.shape[0]
        traj = np.zeros((n_steps, 3), np.float32)
        scan_buf = np.empty(self.cfg.n_scans, np.float32)
        pv = (np.ascontiguousarray(ped_vels, np.float32)
              if ped_vels is not None else None)
        n = self._lib.fastsim_rollout(
            ctypes.byref(self._cfg), ctypes.byref(self._st), _fp(actions),
            n_steps, _fp(pv) if pv is not None else None, _fp(traj),
            _fp(scan_buf))
        return traj[:n]


class FastSimBatch:
    """Native batched multi-env simulator (SoA, OpenMP over envs).

    The host-side counterpart of the vmapped TPU world step
    (`crowdnav_tpu/envs/world.py`): N independent envs per call, crowd
    behavior families (static / random-redraw / fixed direction tables,
    from `crowd_behaviors/simulate_*.py`), jittered auto-reset, raycast
    and termination. RANDOM draws use per-env xorshift64* streams:
    behaviorally equivalent to — deliberately not bit-matching — the JAX
    engine's threefry (parity tests feed both engines explicit
    velocities instead).
    """

    # behavior codes shared with the C side
    STATIC, RANDOM, TABLE = 0, 1, 2

    def __init__(self, cfg, n_envs: int, seed: int = 0):
        from crowdnav_tpu.envs.config import CrowdBehavior

        self._lib = _load()
        self.cfg = cfg
        self.n_envs = int(n_envs)
        p = max(cfg.n_peds, 1)
        self._ped_init = np.zeros((p, 2), np.float32)
        self._ped_dirs = np.zeros((p, 2), np.float32)
        if cfg.n_peds:
            self._ped_init[:] = np.asarray(cfg.ped_init, np.float32)
            self._ped_dirs[:] = np.asarray(cfg.direction_table(), np.float32)
        if cfg.behavior == CrowdBehavior.STATIC:
            behavior = self.STATIC
        elif cfg.behavior == CrowdBehavior.RANDOM:
            behavior = self.RANDOM
        else:
            behavior = self.TABLE
        base = _Config(
            n_scans=cfg.n_scans, n_peds=cfg.n_peds, dt=cfg.dt,
            wheel_separation=cfg.wheel_separation,
            wheel_radius=cfg.wheel_radius, robot_radius=cfg.robot_radius,
            ped_radius=cfg.ped_radius, room_half_inner=cfg.room_half_inner,
            max_scan_range=cfg.max_scan_range,
            lidar_min_range=cfg.lidar_min_range,
            goal_x=cfg.goal[0], goal_y=cfg.goal[1], goal_eps=cfg.goal_eps,
            min_scan_range=cfg.min_scan_range, max_steps=cfg.max_steps)
        self._bc = _BatchConfig(
            base=base, n_envs=self.n_envs, behavior=behavior,
            crowd_speed=cfg.crowd_speed,
            redraw_window=max(cfg.redraw_window_steps, 1),
            start_x=cfg.start_pose[0], start_y=cfg.start_pose[1],
            start_yaw=cfg.start_pose[2],
            start_pos_jitter=cfg.start_pos_jitter,
            start_yaw_jitter=cfg.start_yaw_jitter,
            ped_pos_jitter=cfg.ped_pos_jitter,
            ped_init=_fp(self._ped_init), ped_dirs=_fp(self._ped_dirs))
        n, s = self.n_envs, cfg.n_scans
        self.x = np.zeros(n, np.float32)
        self.y = np.zeros(n, np.float32)
        self.yaw = np.zeros(n, np.float32)
        self.prev_x = np.zeros(n, np.float32)
        self.prev_y = np.zeros(n, np.float32)
        self.step_count = np.zeros(n, np.int32)
        self.done = np.zeros(n, np.int32)
        self.peds = np.zeros((n, p, 2), np.float32)
        self.ped_vel = np.zeros((n, p, 2), np.float32)
        rng = np.random.SeedSequence(seed).generate_state(2 * n, np.uint64)
        self.rng = (rng[:n] | 1).astype(np.uint64)  # nonzero xorshift seeds
        self.scans = np.zeros((n, s), np.float32)
        self.reset()

    def _soa_args(self):
        ip = ctypes.POINTER(ctypes.c_int32)
        up = ctypes.POINTER(ctypes.c_uint64)
        return [ctypes.byref(self._bc),
                _fp(self.x), _fp(self.y), _fp(self.yaw),
                _fp(self.prev_x), _fp(self.prev_y),
                self.step_count.ctypes.data_as(ip),
                self.done.ctypes.data_as(ip),
                _fp(self.peds), _fp(self.ped_vel),
                self.rng.ctypes.data_as(up)]

    def reset(self):
        self._lib.fastsim_reset_batch(*self._soa_args())

    def step(self, actions: np.ndarray) -> np.ndarray:
        """actions (N, 2) -> scans (N, n_scans); done codes in .done
        (0 live, 1 success, 2 collision, 3 timeout). Done envs auto-reset
        at the START of the next call (their final state stays readable)."""
        actions = np.ascontiguousarray(actions, np.float32)
        assert actions.shape == (self.n_envs, 2)
        self._lib.fastsim_step_batch(
            *self._soa_args(), _fp(actions), _fp(self.scans))
        return self.scans
