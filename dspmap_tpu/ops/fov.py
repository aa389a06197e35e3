"""Particle registration into FOV pyramid cells.

The reference rebuilds its ``pyramids_in_fov`` back-pointer table during
prediction: every valid particle in the FOV is linear-probed into its pyramid
cell's slot list, vanishing if the cell is full, and receives an extra
velocity perturbation (``moveParticle``, ``include/dsp_dynamic.h:1232-1271``).

Here the table is recomputed per frame as dense gather tensors: in-FOV
particles are compacted, sorted by pyramid cell and ranked; rank overflow
beyond the per-cell capacity kills the particle (the pyramid-full vanish path,
``dsp_dynamic.h:1256-1259``).  The dense ``[n_pyramids, pyramid_slots]``
layout is exactly what the measurement-update matmul kernel consumes.

Quirk preserved (``dsp_dynamic.h:1261-1269``): surviving in-FOV particles
with ``|vx*vy*vz| >= 1e-6`` get extra vx/vy noise and vz hard-zeroed --
note the vz zeroing here is unconditional in the reference, independent of
``LIMIT_MOVEMENT_IN_XY_PLANE``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import compact_mask, sort_by_destination


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
    f_cap = n_pyr * s_pyr

    q_conj = geometry.quaternion_conjugate(quat)
    ego = particles.pos() - sensor_pos  # [S, V, 3]
    pyr, in_fov = geometry.pyramid_index_world(
        particles.pos(), sensor_pos, q_conj, cfg
    )
    fov_mask = particles.valid & in_fov  # [S, V]

    idx, sel_valid, n_fov, n_global_overflow = compact_mask(fov_mask, f_cap)
    cand_pyr = pyr.ravel()[idx]

    order, sorted_pyr, ranks = sort_by_destination(cand_pyr, sel_valid)
    in_bounds = sorted_pyr < n_pyr
    keep = in_bounds & (ranks < s_pyr)
    kill = in_bounds & ~keep  # pyramid-cell overflow -> vanish
    src = idx[order]  # flat [S*V] index per sorted candidate

    # Kill overflow particles (dsp_dynamic.h:1256-1259).
    flags = particles.flags.ravel().at[jnp.where(kill, src, S * V)].set(
        jnp.uint8(0), mode="drop"
    ).reshape(S, V)

    # Extra in-FOV velocity noise on survivors (dsp_dynamic.h:1261-1269).
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

    new_particles = dataclasses.replace(particles, flags=flags, vx=vx, vy=vy, vz=vz)

    # Dense binned tensors for the update kernel.
    cell = jnp.where(keep, sorted_pyr * s_pyr + ranks, f_cap)
    pos_flat = jnp.stack(
        [new_particles.px.ravel(), new_particles.py.ravel(), new_particles.pz.ravel()],
        axis=-1,
    )
    rng_flat = jnp.linalg.norm(ego.reshape(-1, 3), axis=-1)

    bpos = (
        jnp.zeros((f_cap + 1, 3), jnp.float32)
        .at[cell]
        .set(pos_flat[src], mode="drop")[:f_cap]
        .reshape(n_pyr, s_pyr, 3)
    )
    bw = (
        jnp.zeros((f_cap + 1,), jnp.float32)
        .at[cell]
        .set(new_particles.weight.ravel()[src], mode="drop")[:f_cap]
        .reshape(n_pyr, s_pyr)
    )
    brng = (
        jnp.zeros((f_cap + 1,), jnp.float32)
        .at[cell]
        .set(rng_flat[src], mode="drop")[:f_cap]
        .reshape(n_pyr, s_pyr)
    )
    bmask = (
        jnp.zeros((f_cap + 1,), bool).at[cell].set(True, mode="drop")[:f_cap]
        .reshape(n_pyr, s_pyr)
    )
    bslot = (
        jnp.full((f_cap + 1,), S * V, jnp.int32)
        .at[cell]
        .set(src, mode="drop")[:f_cap]
        .reshape(n_pyr, s_pyr)
    )

    stats = {
        "in_fov": n_fov,
        "pyramid_full_killed": jnp.sum(kill),
        "fov_global_overflow": n_global_overflow,
    }
    return new_particles, FovBinning(bpos, bw, brng, bmask, bslot), stats
