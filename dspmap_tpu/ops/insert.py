"""Capacity-limited particle insertion: the parallel replacement for the
reference's linear-probe slot search (``addAParticle``,
``include/dsp_dynamic.h:1183-1201`` and the voxel half of ``moveParticle``,
``:1206-1230``).

Semantics preserved: each voxel has a fixed slot capacity; candidates fill the
first free slots in arrival order; when a voxel is full the surplus candidates
silently vanish (drop-on-full, ``dsp_dynamic.h:1198-1200,1227-1229``).

Mechanism (fixed-shape, parallel): stable-sort candidates by destination cell,
rank them within each destination, scatter the payloads of candidates whose
rank fits the destination's free-slot count into a staging grid addressed by
(free-slot rank, voxel), then merge the staging grid into the live pool with a
per-slot gather keyed by each empty slot's rank among empties.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import sort_by_destination


def insert_particles(
    particles,
    cfg: MapConfig,
    *,
    pos: jnp.ndarray,  # [M, 3] world positions
    vel: jnp.ndarray,  # [M, 3]
    weight: jnp.ndarray,  # [M]
    valid: jnp.ndarray,  # [M] bool
    origin: jnp.ndarray,  # [3] window origin (world-voxel coords)
    flag,  # uint8 scalar flag for the inserted particles
    t,  # f32 scalar update timestamp
):
    """Insert up to M candidate particles into their voxels' free slots.

    Returns the new particle pool.  Candidates outside the map window are
    dropped (the reference's ``getParticleVoxelsIndex`` failure path,
    dsp_dynamic.h:875,1062-1074); candidates beyond a voxel's free capacity
    are dropped (dsp_dynamic.h:1198-1200).
    """
    S, V = particles.flags.shape

    wv = geometry.world_voxel(pos, cfg)
    inside = geometry.in_window(wv, origin, cfg)
    valid = valid & inside
    dest = geometry.storage_index(wv, cfg)

    order, sorted_dest, ranks = sort_by_destination(dest, valid)

    # Free capacity per voxel before insertion.
    is_empty = particles.flags == 0  # [S, V]
    empty_count = jnp.sum(is_empty, axis=0).astype(jnp.int32)  # [V]

    # Keep candidates whose arrival rank fits the destination's free slots.
    in_bounds = sorted_dest < V
    cap_at_dest = jnp.where(in_bounds, empty_count[jnp.clip(sorted_dest, 0, V - 1)], 0)
    keep = in_bounds & (ranks < cap_at_dest)

    # Stage payloads at (free-slot rank, voxel).  Flat staging index; dropped
    # candidates get an out-of-range index and vanish via mode="drop".
    stage_idx = jnp.where(keep, ranks * V + sorted_dest, S * V)
    payload = jnp.concatenate(
        [pos, vel, weight[:, None]], axis=-1
    )[order]  # [M, 7] in sorted order
    staging = (
        jnp.zeros((S * V, 7), jnp.float32).at[stage_idx].set(payload, mode="drop")
    )
    staged_mask = (
        jnp.zeros((S * V,), bool).at[stage_idx].set(True, mode="drop")
    ).reshape(S, V)
    staging = staging.reshape(S, V, 7)

    # Each empty slot looks up the staging row keyed by its rank among the
    # voxel's empty slots (exclusive running count down the slot axis).
    empty_rank = jnp.cumsum(is_empty.astype(jnp.int32), axis=0) - is_empty  # [S, V]
    take = jnp.take_along_axis(staging, empty_rank[:, :, None], axis=0)  # [S, V, 7]
    filled = is_empty & jnp.take_along_axis(staged_mask, empty_rank, axis=0)

    def mix(old, new):
        return jnp.where(filled, new, old)

    return dataclasses.replace(
        particles,
        flags=jnp.where(filled, jnp.uint8(flag), particles.flags),
        px=mix(particles.px, take[:, :, 0]),
        py=mix(particles.py, take[:, :, 1]),
        pz=mix(particles.pz, take[:, :, 2]),
        vx=mix(particles.vx, take[:, :, 3]),
        vy=mix(particles.vy, take[:, :, 4]),
        vz=mix(particles.vz, take[:, :, 5]),
        weight=mix(particles.weight, take[:, :, 6]),
        t=jnp.where(filled, jnp.float32(t), particles.t),
    )
