"""Capacity-limited particle insertion: the parallel replacement for the
reference's linear-probe slot search (``addAParticle``,
``include/dsp_dynamic.h:1183-1201`` and the voxel half of ``moveParticle``,
``:1206-1230``).

Semantics preserved: each voxel has a fixed slot capacity; candidates fill the
first free slots in arrival order; when a voxel is full the surplus candidates
silently vanish (drop-on-full, ``dsp_dynamic.h:1198-1200,1227-1229``).

Mechanism (tuned to measured TPU costs): candidates arrive destination-sorted
with within-destination arrival ranks (one stable sort); ranks that fit the
destination's free-slot count scatter their payload into a staging plane with
*unique* indices (vectorized scatter, ~0.3 ms at 131k entries); the staging
plane merges into the live pool with a slots-deep select sweep keyed by each
empty slot's rank among empties -- dense VPU passes instead of the 3.1M-entry
gathers XLA would emit for ``take_along_axis``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import sort_by_destination, select_rows


def insert_sorted(
    particles,
    cfg: MapConfig,
    *,
    cell: jnp.ndarray,  # [M] destination storage cell, sorted; >= V invalid
    ranks: jnp.ndarray,  # [M] arrival rank within destination
    payload: jnp.ndarray,  # [M, 7] px,py,pz,vx,vy,vz,weight
    valid: jnp.ndarray,  # [M]
    flag,
    t,
):
    """Insert destination-sorted candidates.  Returns the new pool."""
    S, V = particles.flags.shape
    M = cell.shape[0]

    is_empty = particles.flags == 0  # [S, V]
    empty_count = jnp.sum(is_empty, axis=0).astype(jnp.int32)  # [V]

    in_bounds = valid & (cell < V)
    cap_at_dest = jnp.where(in_bounds, empty_count[jnp.clip(cell, 0, V - 1)], 0)
    keep = in_bounds & (ranks < cap_at_dest)

    # Stage payloads at (free-slot rank, voxel): indices unique by
    # construction -> vectorized scatter.
    stage_idx = jnp.where(keep, ranks * V + cell, S * V)
    staged = jnp.concatenate(
        [payload, keep[:, None].astype(jnp.float32)], axis=-1
    )  # [M, 8]; channel 7 marks occupancy of the staging cell
    staging = (
        jnp.zeros((S * V + 1, 8), jnp.float32)
        .at[stage_idx]
        .set(staged, mode="drop", unique_indices=True)[: S * V]
        .reshape(S, V, 8)
    )

    # Merge: each empty slot takes the staging row keyed by its rank among
    # the voxel's empty slots (select sweep over the small slot axis).
    empty_rank = jnp.cumsum(is_empty, axis=0, dtype=jnp.int32) - is_empty
    take = select_rows(staging, empty_rank, S)  # [S, V, 8]
    filled = is_empty & (take[:, :, 7] > 0.5)

    def mix(old, c):
        return jnp.where(filled, take[:, :, c], old)

    return dataclasses.replace(
        particles,
        flags=jnp.where(filled, jnp.uint8(flag), particles.flags),
        px=mix(particles.px, 0),
        py=mix(particles.py, 1),
        pz=mix(particles.pz, 2),
        vx=mix(particles.vx, 3),
        vy=mix(particles.vy, 4),
        vz=mix(particles.vz, 5),
        weight=mix(particles.weight, 6),
        t=jnp.where(filled, jnp.float32(t), particles.t),
    )


def insert_particles(
    particles,
    cfg: MapConfig,
    *,
    pos: jnp.ndarray,  # [M, 3] world positions
    vel: jnp.ndarray,  # [M, 3]
    weight: jnp.ndarray,  # [M]
    valid: jnp.ndarray,  # [M] bool
    origin: jnp.ndarray,  # [3] window origin (world-voxel coords)
    flag,
    t,
):
    """Insert unsorted candidates (sorts by destination internally).

    Candidates outside the map window are dropped (the reference's
    ``getParticleVoxelsIndex`` failure path, dsp_dynamic.h:875,1062-1074).
    """
    wv = geometry.world_voxel(pos, cfg)
    inside = geometry.in_window(wv, origin, cfg)
    valid = valid & inside
    dest = geometry.storage_index(wv, cfg)

    order, sorted_dest, ranks = sort_by_destination(dest, valid)
    payload = jnp.concatenate([pos, vel, weight[:, None]], axis=-1)[order]
    V = particles.flags.shape[1]
    return insert_sorted(
        particles,
        cfg,
        cell=jnp.minimum(sorted_dest, V),
        ranks=ranks,
        payload=payload,
        valid=sorted_dest < V,
        flag=flag,
        t=t,
    )
