"""Voxel reassignment after motion: move-or-vanish semantics of
``moveParticle`` / ``removeParticle`` (``include/dsp_dynamic.h:1206-1279,
686-690``) without the serial relocation pass.

In the world-frame toroidal layout a particle's storage cell only changes when
its *own* motion crosses a voxel face (bounded by v_max * dt per frame), so the
mover set is small.  Pipeline: (1) kill particles that left the map window
(``dsp_dynamic.h:686-690``); (2) identify movers (storage cell changed);
(3) compact movers into a fixed-capacity buffer; (4) vacate their source
slots; (5) re-insert them with the shared capacity-limited insertion, which
reproduces the voxel-full vanish path (``dsp_dynamic.h:1227-1229``).

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
from .common import compact_mask
from .insert import insert_particles


def rebin(particles, cfg: MapConfig, origin: jnp.ndarray, t):
    """Re-home particles whose world voxel changed; kill window leavers.

    Returns ``(new_particles, stats)`` with stats = dict of scalar counters
    (analogues of the reference's moves_out / voxel_full counters,
    dsp_dynamic.h:629-699).
    """
    S, V = particles.flags.shape
    valid = particles.valid

    pos = particles.pos()  # [S, V, 3]
    wv = geometry.world_voxel(pos, cfg)
    inside = geometry.in_window(wv, origin, cfg) & valid
    moved_out = valid & ~inside

    new_cell = geometry.storage_index(wv, cfg)  # [S, V]
    current_cell = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :], (S, V))
    mover = inside & (new_cell != current_cell)

    idx, sel_valid, n_movers, n_overflow = compact_mask(mover, cfg.mover_capacity)

    def gather(field):
        return field.ravel()[idx]

    m_pos = jnp.stack([gather(particles.px), gather(particles.py), gather(particles.pz)], -1)
    m_vel = jnp.stack([gather(particles.vx), gather(particles.vy), gather(particles.vz)], -1)
    m_w = gather(particles.weight)

    # Vacate: movers and window leavers leave their source slots.
    flags = jnp.where(mover | moved_out, jnp.uint8(0), particles.flags)
    vacated = dataclasses.replace(particles, flags=flags)

    new_particles = insert_particles(
        vacated,
        cfg,
        pos=m_pos,
        vel=m_vel,
        weight=m_w,
        valid=sel_valid,
        origin=origin,
        flag=jnp.uint8(1),
        t=t,
    )
    stats = {
        "moved_out": jnp.sum(moved_out),
        "movers": n_movers,
        "mover_overflow_killed": n_overflow,
        "voxel_full_killed": n_movers - jnp.sum(new_particles.valid)
        + jnp.sum(vacated.valid),
    }
    return new_particles, stats
