"""Voxel reassignment after motion: move-or-vanish semantics of
``moveParticle`` / ``removeParticle`` (``include/dsp_dynamic.h:1206-1279,
686-690``) without the serial relocation pass.

In the world-frame toroidal layout a particle's storage cell only changes when
its *own* motion crosses a voxel face (bounded by v_max * dt per frame), so
the mover set is small.  Pipeline: (1) kill particles that left the map window
(``dsp_dynamic.h:686-690``); (2) identify movers (storage cell changed);
(3) compact + destination-sort the movers in ONE stable sort keyed by
(mover?, destination); (4) vacate their source slots; (5) re-insert with the
shared capacity-limited insertion, which reproduces the voxel-full vanish path
(``dsp_dynamic.h:1227-1229``).

Parallel-semantics deviation (documented): the reference relocates particles
one at a time in storage order, so a mover can occupy a slot another particle
vacates later in the same pass (or fail because a later vacancy has not
happened yet).  Here all movers vacate first, then fill -- same capacity
bound, same conservation, different tie-breaking when voxels are nearly full.
Movers beyond ``cfg.mover_capacity`` (a TPU-side budget with no reference
analogue) are killed and counted.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import compact_and_group, pool_take_stacked
from .insert import insert_sorted


def rebin(particles, cfg: MapConfig, origin: jnp.ndarray, t):
    """Re-home particles whose world voxel changed; kill window leavers.

    Returns ``(new_particles, stats)`` with scalar counters (analogues of the
    reference's moves_out / voxel_full counters, dsp_dynamic.h:629-699).
    """
    S, V = particles.flags.shape
    valid = particles.valid

    wx, wy, wz = geometry.world_voxel_planar(
        particles.px, particles.py, particles.pz, cfg
    )
    inside = geometry.in_window_planar(wx, wy, wz, origin, cfg) & valid
    moved_out = valid & ~inside

    new_cell = geometry.storage_index_planar(wx, wy, wz, cfg)  # [S, V]
    current_cell = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (S, V))
    mover = inside & (new_cell != current_cell)

    idx, cell, ranks, sel_valid, n_movers = compact_and_group(
        mover, new_cell, cfg.mover_capacity, V
    )

    payload = jnp.stack(
        pool_take_stacked(
            [particles.px, particles.py, particles.pz,
             particles.vx, particles.vy, particles.vz,
             particles.weight], idx,
        ),
        axis=-1,
    )

    # Vacate: movers and window leavers leave their source slots.
    flags = jnp.where(mover | moved_out, jnp.int32(0), particles.flags)
    vacated = dataclasses.replace(particles, flags=flags)
    n_before = jnp.sum(vacated.valid)

    new_particles, _, _ = insert_sorted(
        vacated, cfg,
        cell=cell, ranks=ranks, payload=payload, valid=sel_valid,
        flag=jnp.int32(1), t=t if cfg.record_particle_time else None,
    )
    n_kept = jnp.minimum(n_movers, cfg.mover_capacity)
    stats = {
        "moved_out": jnp.sum(moved_out),
        "movers": n_kept,
        "mover_overflow_killed": n_movers - n_kept,
        "voxel_full_killed": n_kept - (jnp.sum(new_particles.valid) - n_before),
    }
    return new_particles, stats
