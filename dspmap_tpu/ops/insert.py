"""Capacity-limited particle insertion: the parallel replacement for the
reference's linear-probe slot search (``addAParticle``,
``include/dsp_dynamic.h:1183-1201`` and the voxel half of ``moveParticle``,
``:1206-1230``).

Semantics preserved: each voxel has a fixed slot capacity; candidates fill the
first free slots in arrival order; when a voxel is full the surplus candidates
silently vanish (drop-on-full, ``dsp_dynamic.h:1198-1200,1227-1229``).

Mechanism (third iteration, tuned to measured TPU costs): a batched tiny sort
along the slot axis yields, per voxel, its empty slot ids in order; candidate
rank r in voxel v maps straight to final slot ``empty_order[r, v]``, so the
payload scatters *directly* into the pool with unique indices (vectorized,
~0.3 ms per field at 131k candidates) -- no staging plane, no select sweep,
no multi-million-element gathers.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import sort_by_destination


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

    is_occupied = particles.flags != 0  # [S, V]
    empty_count = S - jnp.sum(is_occupied, axis=0).astype(jnp.int32)  # [V]

    in_bounds = valid & (cell < V)
    safe_cell = jnp.clip(cell, 0, V - 1)
    keep = in_bounds & (ranks < empty_count[safe_cell])

    # Per-voxel empty slots in slot order: stable tiny sort along the slot
    # axis (occupied slots sink); empty_order[r, v] = id of the r-th empty.
    slot_ids = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None], (S, V)
    )
    empty_order = jnp.sort(
        jnp.where(is_occupied, slot_ids + S, slot_ids), axis=0
    ) % S  # occupied entries pushed past S, then wrapped (masked by `keep`)

    # Final flat position of each kept candidate.
    slot = empty_order[
        jnp.minimum(ranks, S - 1), safe_cell
    ]  # [M] gather (small)
    flat = jnp.where(keep, slot * V + safe_cell, S * V)

    def scat(field, col):
        return (
            field.ravel()
            .at[flat]
            .set(payload[:, col], mode="drop", unique_indices=True)
            .reshape(S, V)
        )

    flags = (
        particles.flags.ravel()
        .at[flat]
        .set(jnp.uint8(flag), mode="drop", unique_indices=True)
        .reshape(S, V)
    )
    tt = (
        particles.t.ravel()
        .at[flat]
        .set(jnp.float32(t), mode="drop", unique_indices=True)
        .reshape(S, V)
    )
    new = dataclasses.replace(
        particles,
        flags=flags,
        px=scat(particles.px, 0),
        py=scat(particles.py, 1),
        pz=scat(particles.pz, 2),
        vx=scat(particles.vx, 3),
        vy=scat(particles.vy, 4),
        vz=scat(particles.vz, 5),
        weight=scat(particles.weight, 6),
        t=tt,
    )
    # placement info: final flat slot (= S*V sentinel for dropped) per
    # destination-sorted candidate
    return new, flat, keep


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
    new, _, _ = insert_sorted(
        particles,
        cfg,
        cell=jnp.minimum(sorted_dest, V),
        ranks=ranks,
        payload=payload,
        valid=sorted_dest < V,
        flag=flag,
        t=t,
    )
    return new
