"""Pallas TPU kernel for the batched lidar raycast.

The raycast is the engine's hottest op (N_env x 359 beams x (P circles +
walls) every step — SURVEY.md §7 hard-part #5). The XLA path
(`ops.lidar.scan` under vmap) already fuses well; this kernel is the
hand-tiled alternative that keeps the whole beam ring in VMEM and walks the
pedestrian list in registers, for the regime where the env batch is large
and the XLA schedule becomes HBM-bound.

Layout: grid over env tiles; each program computes a (TILE_ENV, BEAM_PAD)
block — beams on the 128-lane axis, envs on the sublane axis — so every
per-pedestrian update is one VPU-wide fused multiply/select over the tile.

Use `scan_batch(..., backend="pallas")` on TPU; `backend="xla"` is the
portable reference path (also used by the batched envs by default).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ENV = 128        # envs per program (16 f32 sublane-tiles; 8 was
                      # launch-bound: 2,048 programs at 16k envs)
BEAM_PAD = 384        # 359 beams padded to 3 x 128 lanes
DEG = jnp.pi / 180.0


def _raycast_kernel(pos_ref, yaw_ref, ped_ref, out_ref, *, n_peds,
                    n_scans, ped_radius, room_half, max_range, min_range):
    pos = pos_ref[:]          # (TILE_ENV, 2)
    yaw = yaw_ref[:]          # (TILE_ENV, 1)
    beam = jax.lax.broadcasted_iota(jnp.int32, (TILE_ENV, BEAM_PAD),
                                    1).astype(jnp.float32)
    ang = yaw - beam * DEG                       # (TILE_ENV, BEAM_PAD)
    dx = jnp.cos(ang)
    dy = jnp.sin(ang)
    px = pos[:, 0:1]
    py = pos[:, 1:2]

    # wall exit distance for a ray inside the [-h, h]^2 box
    eps = 1e-12
    sx = jnp.where(dx >= 0, room_half, -room_half)
    sy = jnp.where(dy >= 0, room_half, -room_half)
    tx = (sx - px) / jnp.where(jnp.abs(dx) < eps, eps, dx)
    ty = (sy - py) / jnp.where(jnp.abs(dy) < eps, eps, dy)
    t = jnp.minimum(jnp.where(jnp.abs(dx) < eps, jnp.inf, tx),
                    jnp.where(jnp.abs(dy) < eps, jnp.inf, ty))

    r2 = ped_radius * ped_radius

    def ped_body(p, t):
        rx = ped_ref[:, p, 0:1] - px             # (TILE_ENV, 1)
        ry = ped_ref[:, p, 1:2] - py
        b = rx * dx + ry * dy                    # (TILE_ENV, BEAM_PAD)
        rel2 = rx * rx + ry * ry
        disc = r2 - (rel2 - b * b)
        thit = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (thit >= 0.0)
        return jnp.where(hit, jnp.minimum(t, thit), t)

    if n_peds > 0:
        t = jax.lax.fori_loop(0, n_peds, ped_body, t)

    out_ref[:] = jnp.clip(t, min_range, max_range)


@functools.partial(jax.jit, static_argnames=("ped_radius", "room_half",
                                             "max_range", "min_range",
                                             "n_scans", "interpret"))
def scan_batch_pallas(pos, yaw, ped_pos, ped_radius, room_half, max_range,
                      min_range, n_scans=359, interpret=None):
    """(N,2), (N,), (N,P,2) -> (N, n_scans) observation-order scans.

    ``interpret=None`` resolves to True on CPU (so the same call sites run
    under tests) and False on TPU (the real Mosaic kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pos.shape[0]
    n_peds = ped_pos.shape[1] if ped_pos.ndim == 3 else 0
    if n_peds == 0:
        # keep a 1-wide dummy axis so the BlockSpec is well-formed; the
        # pedestrian loop is skipped (n_peds stays 0)
        ped_pos = jnp.zeros((n, 1, 2), jnp.float32)
    pad = (-n) % TILE_ENV
    if pad:
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        yaw = jnp.pad(yaw, (0, pad))
        ped_pos = jnp.pad(ped_pos, ((0, pad), (0, 0), (0, 0)))
    n_pad = pos.shape[0]
    kernel = functools.partial(
        _raycast_kernel, n_peds=n_peds, n_scans=n_scans,
        ped_radius=float(ped_radius), room_half=float(room_half),
        max_range=float(max_range), min_range=float(min_range))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE_ENV,),
        in_specs=[
            pl.BlockSpec((TILE_ENV, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ENV, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ENV, max(n_peds, 1), 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ENV, BEAM_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, BEAM_PAD), jnp.float32),
        interpret=interpret,
    )(pos.astype(jnp.float32), yaw.astype(jnp.float32)[:, None],
      ped_pos.astype(jnp.float32))
    return out[:n, :n_scans]


def scan_batch(pos, yaw, ped_pos, ped_radius, room_half, max_range,
               min_range, n_scans=359, backend="xla"):
    """Batched scan with selectable backend (numerics identical)."""
    if backend == "pallas":
        return scan_batch_pallas(pos, yaw, ped_pos, ped_radius, room_half,
                                 max_range, min_range, n_scans)
    from crowdnav_tpu.ops import lidar
    f = jax.vmap(lambda p, y, c: lidar.scan(p, y, c, ped_radius, room_half,
                                            max_range, min_range, n_scans))
    return f(pos, yaw, ped_pos)
