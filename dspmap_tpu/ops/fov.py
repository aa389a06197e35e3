"""Particle registration into FOV pyramid cells.

The reference rebuilds its ``pyramids_in_fov`` back-pointer table during
prediction: every valid particle in the FOV is linear-probed into its pyramid
cell's slot list, vanishing if the cell is full, and receives an extra
velocity perturbation (``moveParticle``, ``include/dsp_dynamic.h:1232-1271``).

Here the table is recomputed per frame as dense gather tensors: in-FOV
particles are compacted AND pyramid-sorted in one stable sort keyed by
(in-FOV?, pyramid); rank overflow beyond the per-cell capacity kills the
particle (the pyramid-full vanish path, ``dsp_dynamic.h:1256-1259``).  The
dense ``[n_pyramids, pyramid_slots]`` layout is exactly what the measurement
update's matmul kernel consumes.  All binned-tensor scatters use unique
indices (vectorized on TPU); all geometry runs on coordinate planes (no
``[..., 3]`` stacking).

Quirk preserved (``dsp_dynamic.h:1261-1269``): surviving in-FOV particles
with ``|vx*vy*vz| >= 1e-6`` get extra vx/vy noise and vz hard-zeroed -- the
vz zeroing here is unconditional in the reference, independent of
``LIMIT_MOVEMENT_IN_XY_PLANE``.  Under xy-limited configs vz is identically
zero, the product is zero, and the branch is statically dead -- elided
exactly (see ops/propagate.py docstring).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import compact_and_group


class FovBinning(NamedTuple):
    """Dense pyramid-binned view of the in-FOV particle population."""

    pos: jnp.ndarray  # f32 [n_pyr, S_pyr, 3] world positions
    weight: jnp.ndarray  # f32 [n_pyr, S_pyr]
    rng: jnp.ndarray  # f32 [n_pyr, S_pyr] ego range (occlusion test)
    mask: jnp.ndarray  # bool [n_pyr, S_pyr]
    slot: jnp.ndarray  # i32 [n_pyr, S_pyr] flat index into the [S, V] pool


def register_fov(
    particles,
    cfg: MapConfig,
    sensor_pos: jnp.ndarray,
    quat: jnp.ndarray,
    key: jax.Array,
):
    """Returns ``(new_particles, FovBinning, stats)``.

    ``new_particles`` reflects pyramid-overflow kills and the in-FOV velocity
    perturbation; the binning indexes into ``new_particles``.
    """
    S, V = particles.flags.shape
    n_pyr, s_pyr = cfg.n_pyramids, cfg.pyramid_slots
    f_cap = cfg.fov_buffer_capacity
    grid_cap = n_pyr * s_pyr

    # Sensor-frame coordinates of every slot, on planes.
    Rm = geometry.rotation_matrix(geometry.quaternion_conjugate(quat))
    ex = particles.px - sensor_pos[0]
    ey = particles.py - sensor_pos[1]
    ez = particles.pz - sensor_pos[2]
    sx, sy, sz = geometry.rotate_planar(Rm, ex, ey, ez)
    pyr, in_fov = geometry.pyramid_index_planar(sx, sy, sz, cfg)
    fov_mask = particles.valid & in_fov  # [S, V]

    # Fused compaction + pyramid grouping (one stable sort over the pool).
    idx, cand_pyr, ranks, sel_valid, n_fov = compact_and_group(
        fov_mask, pyr, f_cap, n_pyr
    )
    keep = sel_valid & (ranks < s_pyr)
    kill = sel_valid & ~keep  # pyramid-cell overflow -> vanish

    # Kill overflow particles (dsp_dynamic.h:1256-1259).
    flags = particles.flags.ravel().at[jnp.where(kill, idx, S * V)].set(
        jnp.uint8(0), mode="drop"
    ).reshape(S, V)

    # Extra in-FOV velocity noise on survivors (dsp_dynamic.h:1261-1269);
    # statically dead under xy-limited configs (vz == 0 for all particles).
    if cfg.limit_motion_to_xy_plane or cfg.motion_model == "static":
        vx, vy, vz = particles.vx, particles.vy, particles.vz
        alive_extra = None
    else:
        alive_fov = fov_mask & (flags != 0)
        noise = (
            jax.random.normal(key, (2,) + particles.vx.shape, jnp.float32)
            * cfg.velocity_noise_std
        )
        keep_still = jnp.abs(particles.vx * particles.vy * particles.vz) < 1e-6
        jitter = alive_fov & ~keep_still
        vx = jnp.where(jitter, particles.vx + noise[0], particles.vx)
        vy = jnp.where(jitter, particles.vy + noise[1], particles.vy)
        vz = jnp.where(jitter, 0.0, particles.vz)
        alive_extra = jitter

    new_particles = dataclasses.replace(particles, flags=flags, vx=vx, vy=vy, vz=vz)

    # Dense binned tensors: all scatters hit unique (pyramid, rank) cells.
    cell = jnp.where(keep, cand_pyr * s_pyr + ranks, grid_cap)
    px = particles.px.ravel()[idx]
    py = particles.py.ravel()[idx]
    pz = particles.pz.ravel()[idx]
    w = new_particles.weight.ravel()[idx]
    rng_c = jnp.sqrt(
        (px - sensor_pos[0]) ** 2
        + (py - sensor_pos[1]) ** 2
        + (pz - sensor_pos[2]) ** 2
    )

    def scat(vals, fill=0.0):
        return (
            jnp.full((grid_cap + 1,) + vals.shape[1:], fill, vals.dtype)
            .at[cell]
            .set(vals, mode="drop", unique_indices=True)[:grid_cap]
        )

    bpos = scat(jnp.stack([px, py, pz], axis=-1)).reshape(n_pyr, s_pyr, 3)
    bw = scat(w).reshape(n_pyr, s_pyr)
    brng = scat(rng_c).reshape(n_pyr, s_pyr)
    bmask = scat(keep).reshape(n_pyr, s_pyr)
    bslot = (
        jnp.full((grid_cap + 1,), S * V, jnp.int32)
        .at[cell]
        .set(idx, mode="drop", unique_indices=True)[:grid_cap]
        .reshape(n_pyr, s_pyr)
    )

    stats = {
        "in_fov": jnp.minimum(n_fov, f_cap),
        "pyramid_full_killed": jnp.sum(kill),
        "fov_global_overflow": jnp.maximum(n_fov - f_cap, 0),
    }
    return new_particles, FovBinning(bpos, bw, brng, bmask, bslot), stats


def register_fov_masked(
    particles,
    cfg: MapConfig,
    sensor_pos: jnp.ndarray,
    pyr_plane: jnp.ndarray,
    fov_plane: jnp.ndarray,
    key: jax.Array,
):
    """:func:`register_fov` with the per-slot pyramid geometry precomputed by
    the fused sweep (limit-xy / static configurations: the in-FOV velocity
    perturbation is statically dead, see module docstring)."""
    S, V = particles.flags.shape
    n_pyr, s_pyr = cfg.n_pyramids, cfg.pyramid_slots
    f_cap = cfg.fov_buffer_capacity
    grid_cap = n_pyr * s_pyr

    fov_mask = fov_plane & particles.valid

    idx, cand_pyr, ranks, sel_valid, n_fov = compact_and_group(
        fov_mask, pyr_plane, f_cap, n_pyr
    )
    keep = sel_valid & (ranks < s_pyr)
    kill = sel_valid & ~keep

    flags = particles.flags.ravel().at[jnp.where(kill, idx, S * V)].set(
        jnp.uint8(0), mode="drop"
    ).reshape(S, V)
    new_particles = dataclasses.replace(particles, flags=flags)

    cell = jnp.where(keep, cand_pyr * s_pyr + ranks, grid_cap)
    px = particles.px.ravel()[idx]
    py = particles.py.ravel()[idx]
    pz = particles.pz.ravel()[idx]
    w = particles.weight.ravel()[idx]
    rng_c = jnp.sqrt(
        (px - sensor_pos[0]) ** 2
        + (py - sensor_pos[1]) ** 2
        + (pz - sensor_pos[2]) ** 2
    )

    def scat(vals, fill=0.0):
        return (
            jnp.full((grid_cap + 1,) + vals.shape[1:], fill, vals.dtype)
            .at[cell]
            .set(vals, mode="drop", unique_indices=True)[:grid_cap]
        )

    bpos = scat(jnp.stack([px, py, pz], axis=-1)).reshape(n_pyr, s_pyr, 3)
    bw = scat(w).reshape(n_pyr, s_pyr)
    brng = scat(rng_c).reshape(n_pyr, s_pyr)
    bmask = scat(keep).reshape(n_pyr, s_pyr)
    bslot = (
        jnp.full((grid_cap + 1,), S * V, jnp.int32)
        .at[cell]
        .set(idx, mode="drop", unique_indices=True)[:grid_cap]
        .reshape(n_pyr, s_pyr)
    )

    stats = {
        "in_fov": jnp.minimum(n_fov, f_cap),
        "pyramid_full_killed": jnp.sum(kill),
        "fov_global_overflow": jnp.maximum(n_fov - f_cap, 0),
    }
    return new_particles, FovBinning(bpos, bw, brng, bmask, bslot), stats
