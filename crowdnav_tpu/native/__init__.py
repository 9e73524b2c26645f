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


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
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
