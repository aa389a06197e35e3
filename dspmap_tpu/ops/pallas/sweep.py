"""Pallas TPU kernel for the fused per-slot sweep (see ops/sweep.py).

One pass over the particle pool computes: constant-velocity advance, world
voxel + window membership (rebin masks), and FOV-pyramid geometry -- the
work of three XLA stages, at the HBM-bandwidth floor (~190 MB of traffic,
~0.25 ms on v5e, vs several ms of separate fusions).

Covers the deterministic-prediction configurations (``limit_motion_to_xy_plane``
and the static model) where the reference's own noise quirk makes prediction
RNG-free (ops/propagate.py docstring); ``sweep()`` dispatches here on TPU and
to the XLA reference implementation elsewhere.  The kernel must produce
outputs identical to ``sweep_reference`` (tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MapConfig
from ..sweep import SweepOut

_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def _atan2(y, x):
    """Mosaic has no atan2 lowering; minimax polynomial (A&S 4.4.49-style,
    |err| ~ 1e-5 rad -- far below the 3-degree pyramid quantum)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = num / jnp.maximum(den, 1e-30)
    r2 = r * r
    a = r * (
        0.99986600
        + r2 * (-0.33029950
                + r2 * (0.18014100
                        + r2 * (-0.08513300 + r2 * 0.02083510)))
    )
    a = jnp.where(swap, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def _kernel(scal_ref, iscal_ref, flags_ref, px_ref, py_ref, pz_ref,
            vx_ref, vy_ref,
            opx_ref, opy_ref, oflags_ref, ocell_ref, otags_ref,
            *, cfg: MapConfig, advance: bool, L: int):
    S = cfg.slots_per_voxel
    dt = scal_ref[0]
    sx0, sy0, sz0 = scal_ref[1], scal_ref[2], scal_ref[3]
    R = [scal_ref[4 + i] for i in range(9)]
    ox, oy, oz = iscal_ref[0], iscal_ref[1], iscal_ref[2]
    sox, soy, soz = iscal_ref[3], iscal_ref[4], iscal_ref[5]  # mod(o, dims)

    flags = flags_ref[...]
    valid = flags != 0
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
    if advance:
        px = jnp.where(valid, px + vx_ref[...] * dt, px)
        py = jnp.where(valid, py + vy_ref[...] * dt, py)
        # vz == 0 under limit_motion_to_xy_plane: z never advances

    inv = 1.0 / cfg.voxel_resolution
    wx = jnp.floor(px * inv).astype(jnp.int32)
    wy = jnp.floor(py * inv).astype(jnp.int32)
    wz = jnp.floor(pz * inv).astype(jnp.int32)
    rx, ry, rz = wx - ox, wy - oy, wz - oz
    inside = (
        (rx >= 0) & (rx < cfg.nx)
        & (ry >= 0) & (ry < cfg.ny)
        & (rz >= 0) & (rz < cfg.nz)
    )
    moved_out = valid & ~inside
    new_flags = jnp.where(moved_out, jnp.int32(0), flags)

    cx = sox + jnp.clip(rx, 0, cfg.nx - 1)
    cy = soy + jnp.clip(ry, 0, cfg.ny - 1)
    cz = soz + jnp.clip(rz, 0, cfg.nz - 1)
    cx = jnp.where(cx >= cfg.nx, cx - cfg.nx, cx)
    cy = jnp.where(cy >= cfg.ny, cy - cfg.ny, cy)
    cz = jnp.where(cz >= cfg.nz, cz - cfg.nz, cz)
    cell = (cz * cfg.ny + cy) * cfg.nx + cx
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        + pl.program_id(0) * L
    )
    mover = valid & inside & (cell != col)

    ex, ey, ez = px - sx0, py - sy0, pz - sz0
    fx = R[0] * ex + R[1] * ey + R[2] * ez
    fy = R[3] * ex + R[4] * ey + R[5] * ez
    fz = R[6] * ex + R[7] * ey + R[8] * ez
    az = _atan2(fy, fx)
    el = _atan2(fz, fx)
    in_fov = (
        (jnp.abs(az) <= cfg.half_fov_h_rad)
        & (jnp.abs(el) <= cfg.half_fov_v_rad)
        & (fx > 0.0)
    )
    res = cfg.angle_resolution_rad
    h = jnp.clip(
        jnp.floor((az + cfg.half_fov_h_rad) / res).astype(jnp.int32),
        0, cfg.n_pyramids_h - 1,
    )
    v = jnp.clip(
        jnp.floor((cfg.half_fov_v_rad - el) / res).astype(jnp.int32),
        0, cfg.n_pyramids_v - 1,
    )

    opx_ref[...] = px
    opy_ref[...] = py
    oflags_ref[...] = new_flags
    ocell_ref[...] = cell
    fov = valid & inside & in_fov
    # vz == 0 by construction on the fused-sweep configurations (limit-xy /
    # static), so the nonzero-velocity test reduces to vx/vy
    moving = valid & inside & ((vx_ref[...] != 0.0) | (vy_ref[...] != 0.0))
    pyr = h * cfg.n_pyramids_v + v
    packed = (
        mover.astype(jnp.int32)
        | (fov.astype(jnp.int32) << 1)
        | (moving.astype(jnp.int32) << 2)
        | (moved_out.astype(jnp.int32) << 3)
        | (pyr << 4)
    )
    otags_ref[...] = jnp.where(mover | fov | moving | moved_out, packed, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def sweep_pallas(particles, cfg: MapConfig, dt, origin, sensor_pos, quat,
                 interpret: bool = False) -> SweepOut:
    from ... import geometry

    S, V = particles.flags.shape
    L = 2048
    grid = (pl.cdiv(V, L),)
    advance = cfg.motion_model != "static"

    Rm = geometry.rotation_matrix(geometry.quaternion_conjugate(quat)).ravel()
    scal = jnp.concatenate(
        [jnp.asarray([dt], jnp.float32),
         jnp.asarray(sensor_pos, jnp.float32), Rm.astype(jnp.float32),
         jnp.zeros((3,), jnp.float32)]
    )
    origin = jnp.asarray(origin, jnp.int32)
    dims = jnp.asarray([cfg.nx, cfg.ny, cfg.nz], jnp.int32)
    iscal = jnp.concatenate([origin, jnp.mod(origin, dims)])

    def bspec():
        return pl.BlockSpec((S, L), lambda b: (0, b), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, advance=advance, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(), bspec(), bspec(), bspec(), bspec(), bspec(),
        ],
        out_specs=[bspec() for _ in range(5)],
        out_shape=[
            jax.ShapeDtypeStruct((S, V), jnp.float32),
            jax.ShapeDtypeStruct((S, V), jnp.float32),
            jax.ShapeDtypeStruct((S, V), jnp.int32),
            jax.ShapeDtypeStruct((S, V), jnp.int32),
            jax.ShapeDtypeStruct((S, V), jnp.int32),
        ],
        interpret=interpret,
    )(scal, iscal, particles.flags, particles.px, particles.py, particles.pz,
      particles.vx, particles.vy)
    opx, opy, oflags, ocell, otags = outs
    return SweepOut(
        px=opx, py=opy, pz=particles.pz, flags=oflags,
        new_cell=ocell, tags=otags,
    )
