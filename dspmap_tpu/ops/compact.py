"""Alive-proportional particle core: the whole per-frame cycle as O(alive)
work over one compact ``[P]`` SoA array (``cfg.layout == "compact"``).

The reference walks its full ``[V][S]`` slot pool once per stage
(``mapPrediction`` ``include/dsp_dynamic.h:627-701``, ``moveParticle``
``:1206-1279``, ``mapOccupancyCalculationAndResample`` ``:924-1057``); the
pool-layout translation (``ops/sweep.py`` / ``ops/fov.py`` /
``ops/occupancy.py``) streams the same 3.1M-slot planes on TPU.  But the
realized live population is ~21k particles, so >99% of every pool pass's
bytes are dead slots.  This module keeps the live set in a dense
``[P = cfg.compact_capacity]`` array (``state.Particles`` with 1-D planes)
and reproduces the identical per-voxel semantics with sorts, segment scans
and scatter-adds whose cost scales with the population:

* a particle's **storage cell** is derived from its world position
  (``geometry.storage_index_planar`` is toroidal and origin-free), so ego
  motion and self-motion never relocate rows -- relocation is just the cell
  value changing;
* **per-voxel slot capacity** (``S = cfg.slots_per_voxel``; drop-on-full,
  ``dsp_dynamic.h:1198-1200,1227-1229``) is enforced by within-voxel arrival
  ranks: stayers keep their claim, movers/newborns rank behind the current
  occupancy and die when it is exhausted -- the same survival semantics
  with the documented vacate-then-fill tie-breaking deviation of
  ``ops/rebin.py``;
* **pyramid capacity** (``dsp_dynamic.h:1256-1259``) is the same rank kill
  the pool layout applies, over the compacted in-FOV set;
* **occupancy/future/resample** (``dsp_dynamic.h:924-1057``) run over the
  population sorted by cell: per-voxel aggregates are one multi-column
  scatter-add, the in-voxel systematic-resampling walk is the closed-form
  cumulative-weight bucketing of ``ops/occupancy.py`` evaluated on segment
  scans, and the output is written as a fresh *defragmented* (cell-sorted)
  array -- there is no pool write-back at all.

Global row capacity ``P`` is a TPU-side budget (like ``mover_capacity``):
when the frame's survivors + copies + newborns exceed it, the surplus is
dropped and counted (``pool_overflow`` / resample-copy clipping).  Per-voxel
capacity semantics are exact.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from ..state import FLAG_NEWBORN, FLAG_VALID
from .common import (I32_MAX, compact_and_group, compact_mask, group_ranks,
                     sort_by_destination)


class CompactSweep(NamedTuple):
    """Per-row outcome of the fused advance/geometry pass."""

    cell: jnp.ndarray  # i32 [P] storage cell of the advanced position
    mover: jnp.ndarray  # bool [P]: cell changed this frame
    fov: jnp.ndarray  # bool [P]: alive & inside & in FOV
    moving: jnp.ndarray  # bool [P]: alive & nonzero velocity
    pyr: jnp.ndarray  # i32 [P] pyramid cell (garbage where ~fov)
    moved_out: jnp.ndarray  # bool [P]: left the window (killed)


def _scatter_add_cols(cell, valid, cols, n_cells):
    """One multi-column scatter-add ``[P] -> [n_cells, C]`` (XLA scatter cost
    is per index row, so C columns ride one pass; cf. ops/fov.py's stacked
    binning scatter)."""
    upd = jnp.stack([c.astype(jnp.float32) for c in cols], axis=-1)  # [P, C]
    idx = jnp.where(valid, cell, n_cells)
    out = (
        jnp.zeros((n_cells + 1, len(cols)), jnp.float32)
        .at[idx]
        .add(upd, mode="drop")[:n_cells]
    )
    return [out[:, i] for i in range(len(cols))]


def sweep_compact(particles, cfg: MapConfig, dt, origin, sensor_pos, quat,
                  key, rt=None):
    """Prediction advance + window test + cell/pyramid geometry, one [P] pass
    (``mapPrediction`` motion+bounds, ``dsp_dynamic.h:653-690``; pyramid
    membership of ``moveParticle``, ``:1232-1243``).

    Returns ``(new_particles, CompactSweep)``.  Velocity noise follows
    ops/propagate.py exactly, including the reference's keep-still quirk
    (``dsp_dynamic.h:653-659``) and its static elision under
    ``limit_motion_to_xy_plane``."""
    valid = particles.valid
    vx, vy, vz = particles.vx, particles.vy, particles.vz

    if cfg.motion_model == "static":
        px, py, pz = particles.px, particles.py, particles.pz
    else:
        if not cfg.limit_motion_to_xy_plane:
            sigma_v = (cfg.velocity_noise_std if rt is None
                       else rt.velocity_noise_std)
            noise = jax.random.normal(key, (3,) + vx.shape, jnp.float32) * sigma_v
            keep_still = jnp.abs(vx * vy * vz) < 1e-6  # dsp_dynamic.h:653
            jitter = valid & ~keep_still
            vx = jnp.where(jitter, vx + noise[0], vx)
            vy = jnp.where(jitter, vy + noise[1], vy)
            vz = jnp.where(jitter, vz + noise[2], vz)
        px = jnp.where(valid, particles.px + vx * dt, particles.px)
        py = jnp.where(valid, particles.py + vy * dt, particles.py)
        pz = jnp.where(valid, particles.pz + vz * dt, particles.pz)

    wx, wy, wz = geometry.world_voxel_planar(px, py, pz, cfg)
    inside = geometry.in_window_planar(wx, wy, wz, origin, cfg)
    moved_out = valid & ~inside  # dsp_dynamic.h:686-690
    alive = valid & inside
    flags = jnp.where(moved_out, jnp.int32(0), particles.flags)

    new_cell = geometry.storage_index_planar(wx, wy, wz, cfg)
    owx, owy, owz = geometry.world_voxel_planar(
        particles.px, particles.py, particles.pz, cfg
    )
    cur_cell = geometry.storage_index_planar(owx, owy, owz, cfg)
    mover = alive & (new_cell != cur_cell)

    Rm = geometry.rotation_matrix(geometry.quaternion_conjugate(quat))
    sx, sy, sz = geometry.rotate_planar(
        Rm, px - sensor_pos[0], py - sensor_pos[1], pz - sensor_pos[2]
    )
    pyr, in_fov = geometry.pyramid_index_planar(sx, sy, sz, cfg)
    fov = alive & in_fov
    moving = alive & ((vx != 0.0) | (vy != 0.0) | (vz != 0.0))

    new_particles = dataclasses.replace(
        particles, px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz, flags=flags
    )
    sw = CompactSweep(
        cell=jnp.where(alive, new_cell, cfg.storage_voxels),
        mover=mover, fov=fov, moving=moving, pyr=pyr, moved_out=moved_out,
    )
    return new_particles, sw


def rebin_compact(particles, sw: CompactSweep, cfg: MapConfig):
    """Voxel-capacity enforcement for relocated particles (the voxel half of
    ``moveParticle``, ``dsp_dynamic.h:1206-1230``): movers rank behind their
    destination voxel's stayers and die at rank >= S (drop-on-full,
    ``:1227-1229``).  Stayers never die here (they already hold a slot).

    Returns ``(new_particles, stay_count[Vs], stats)``; ``stay_count`` is
    per-voxel stayer occupancy, reused by callers.  Movers beyond
    ``cfg.mover_capacity`` stay alive UNCHECKED against capacity (counted in
    ``mover_overflow_unchecked``; the pool layout kills them instead --
    documented budget deviation, the buffer is sized ~4x peak)."""
    S = cfg.slots_per_voxel
    Vs = cfg.storage_voxels
    m_cap = cfg.mover_capacity
    alive = particles.flags != 0

    stayer = alive & ~sw.mover & (sw.cell < Vs)
    (stay_count,) = _scatter_add_cols(sw.cell, stayer, (stayer,), Vs)

    m_i, m_ok, n_mov, m_over = compact_mask(sw.mover & alive, m_cap)
    m_cell = jnp.where(m_ok, sw.cell[m_i], Vs)
    order, sorted_cell, ranks = sort_by_destination(m_cell, m_ok)
    cell_safe = jnp.minimum(sorted_cell, Vs - 1)
    kill_sorted = (sorted_cell < Vs) & (
        stay_count[cell_safe].astype(jnp.int32) + ranks >= S
    )
    kill_rows = jnp.where(kill_sorted, m_i[order], particles.flags.shape[0])
    flags = particles.flags.at[kill_rows].set(jnp.int32(0), mode="drop")

    n_killed = jnp.sum(kill_sorted)
    stats = {
        "moved_out": jnp.sum(sw.moved_out),
        "movers": jnp.minimum(n_mov, m_cap),
        "mover_overflow_killed": jnp.int32(0),
        "mover_overflow_unchecked": m_over,
        "voxel_full_killed": n_killed,
    }
    return dataclasses.replace(particles, flags=flags), stay_count, stats


def fov_geometry_compact(particles, cfg: MapConfig, sensor_pos, quat):
    """(pyramid cell [P], in-FOV mask [P]) of the compact set for one sensor
    pose -- the per-sensor half of :func:`sweep_compact`'s geometry, for
    multi-sensor steps that register against several poses per frame."""
    Rm = geometry.rotation_matrix(geometry.quaternion_conjugate(quat))
    sx, sy, sz = geometry.rotate_planar(
        Rm,
        particles.px - sensor_pos[0],
        particles.py - sensor_pos[1],
        particles.pz - sensor_pos[2],
    )
    pyr, in_fov = geometry.pyramid_index_planar(sx, sy, sz, cfg)
    return pyr, particles.valid & in_fov


def register_fov_compact(particles, cfg: MapConfig, pyr, fov_mask,
                         sensor_pos, key=None, rt=None):
    """FOV registration over the compact set: compaction + pyramid grouping,
    rank kill beyond the per-cell capacity (``dsp_dynamic.h:1256-1259``) and
    the dense+spill binning the measurement update consumes (same
    :class:`~.fov.FovBinning` layout; ``slot`` holds compact row indices,
    sentinel ``P``).

    ``pyr``/``fov_mask`` come from :class:`CompactSweep` (single-sensor) or
    :func:`fov_geometry_compact` (multi-sensor).  The extra in-FOV velocity
    perturbation (``dsp_dynamic.h:1261-1269``) applies on survivors for
    noisy configurations (statically dead under limit-xy / static, see
    ops/fov.py)."""
    from .fov import _bin_candidates

    f_cap = cfg.fov_buffer_capacity
    n_pyr = cfg.n_pyramids

    fov_alive = fov_mask & (particles.flags != 0)
    idx, cand_pyr, ranks, sel_valid, n_fov = compact_and_group(
        fov_alive, pyr, f_cap, n_pyr
    )
    flags, fovbin, stats = _bin_candidates(
        particles, cfg, sensor_pos, idx, cand_pyr, ranks, sel_valid,
        jnp.sum(fov_alive),
    )

    if cfg.limit_motion_to_xy_plane or cfg.motion_model == "static":
        vx, vy, vz = particles.vx, particles.vy, particles.vz
    else:
        alive_fov = fov_alive & (flags != 0)
        sigma_v = cfg.velocity_noise_std if rt is None else rt.velocity_noise_std
        noise = (
            jax.random.normal(key, (2,) + particles.vx.shape, jnp.float32)
            * sigma_v
        )
        keep_still = jnp.abs(particles.vx * particles.vy * particles.vz) < 1e-6
        jitter = alive_fov & ~keep_still
        vx = jnp.where(jitter, particles.vx + noise[0], particles.vx)
        vy = jnp.where(jitter, particles.vy + noise[1], particles.vy)
        vz = jnp.where(jitter, 0.0, particles.vz)

    new_particles = dataclasses.replace(
        particles, flags=flags, vx=vx, vy=vy, vz=vz
    )
    return new_particles, fovbin, stats


def insert_compact(particles, cfg: MapConfig, *, pos, vel, weight, valid,
                   origin, flag, t, count_v, budget: int | None = None,
                   shard=None):
    """Capacity-limited insertion into free rows of the compact array
    (``addAParticle``, ``dsp_dynamic.h:1183-1201``).

    ``count_v [Vs]``: current per-voxel occupancy (the capacity baseline).
    Candidates rank per destination voxel in arrival order and are eligible
    while ``rank < S - count_v[dest]`` (drop-on-full, ``:1198-1200``);
    eligible candidates land in free rows first-to-last.  Rows exhausted ->
    drop + count (``pool_overflow``; global-budget deviation, no reference
    analogue).  Returns ``(new_particles, n_born, n_dropped)``.

    ``shard``: candidates whose destination voxel this shard does not own
    are excluded (their owner inserts them); ``count_v`` is then the local
    slab's table."""
    P = particles.flags.shape[0]
    S = cfg.slots_per_voxel
    Vs = count_v.shape[0]
    M = pos.shape[0]

    wv = geometry.world_voxel(pos, cfg)
    inside = geometry.in_window(wv, origin, cfg)
    dest = geometry.storage_index(wv, cfg)
    valid = valid & inside
    if shard is not None:
        valid = valid & shard.owns(dest, Vs)
        dest = jnp.clip(dest - shard.lo, 0, Vs - 1)
    order, sorted_dest, ranks = sort_by_destination(dest, valid)
    dest_safe = jnp.minimum(jnp.where(sorted_dest < I32_MAX, sorted_dest, 0),
                            Vs - 1)
    free_cap = jnp.maximum(
        S - count_v[dest_safe].astype(jnp.int32), 0
    )
    eligible = (sorted_dest < I32_MAX) & (ranks < free_cap)

    if budget is None:
        budget = M
    budget = min(budget, M)

    def branch(bud):
        def run(particles):
            c_pos, c_ok, n_elig, _ = compact_mask(eligible, bud)
            free_rows, free_ok, n_free, _ = compact_mask(
                particles.flags == 0, bud
            )
            land = c_ok & (jnp.arange(bud, dtype=jnp.int32) < n_free)
            row = jnp.where(land, free_rows, P)
            src = order[c_pos]  # original candidate index
            pay = jnp.concatenate(
                [pos, vel, weight[:, None]], axis=1
            )[src]  # [bud, 7] contiguous row gather
            flags = particles.flags.at[row].set(
                jnp.broadcast_to(jnp.asarray(flag, jnp.int32), row.shape),
                mode="drop", unique_indices=True,
            )

            def put(plane, vals):
                return plane.at[row].set(vals, mode="drop",
                                         unique_indices=True)

            tt = particles.t if t is None else put(
                particles.t, jnp.broadcast_to(jnp.float32(t), row.shape))
            new = dataclasses.replace(
                particles,
                flags=flags,
                px=put(particles.px, pay[:, 0]),
                py=put(particles.py, pay[:, 1]),
                pz=put(particles.pz, pay[:, 2]),
                vx=put(particles.vx, pay[:, 3]),
                vy=put(particles.vy, pay[:, 4]),
                vz=put(particles.vz, pay[:, 5]),
                weight=put(particles.weight, pay[:, 6]),
                t=tt,
            )
            n_landed = jnp.sum(land)
            return new, n_landed, jnp.minimum(n_elig, bud) - n_landed
        return run

    if budget < M:
        # bucket specialization as in ops/insert.py: the budget branch runs
        # every steady-state frame; burst frames fall through to full width.
        n_elig_total = jnp.sum(eligible)
        return jax.lax.cond(
            n_elig_total <= budget, branch(budget), branch(M), particles
        )
    return branch(M)(particles)


def occupancy_compact(particles, cfg: MapConfig, origin, future_in,
                      shard=None):
    """Cull + per-voxel aggregates + future scatter + systematic resampling
    over the compact set (``mapOccupancyCalculationAndResample``,
    ``dsp_dynamic.h:924-1057``), writing a fresh defragmented (cell-sorted)
    array.

    Semantics match ops/occupancy.py line for line: weight cull
    (``:941-942``), survivor weight sums / old-particle velocity means
    (``:944-948,968-984``), per-horizon future scatter of old particles
    (``:950-964``), per-voxel systematic resampling with mass-conserving
    fold-back (``:986-1055``) and the newborn flag reset (``:968``).  The
    in-voxel cumulative-weight walk runs on segment scans of the cell-sorted
    population; copy placement respects the voxel's free-slot count
    ``S - count + dropped`` exactly as the pool formulation's free-slot
    pool.  In-voxel order is compact-row order (the pool layout uses slot
    order, the reference its insert order -- all three are arbitrary; the
    documented survival-semantics-not-scan-order deviation, SURVEY.md 7.3)."""
    P = particles.flags.shape[0]
    S = cfg.slots_per_voxel
    Vs = cfg.storage_voxels
    T = cfg.n_horizons

    w = particles.weight
    valid_in = particles.valid
    culled = valid_in & (w < cfg.weight_cull_threshold)
    valid = valid_in & ~culled
    newborn = valid & (particles.flags == FLAG_NEWBORN)
    old = valid & ~newborn
    moving = old & (
        (particles.vx != 0.0) | (particles.vy != 0.0) | (particles.vz != 0.0)
    )

    wx, wy, wz = geometry.world_voxel_planar(
        particles.px, particles.py, particles.pz, cfg
    )
    cell = geometry.storage_index_planar(wx, wy, wz, cfg)

    # ---- per-voxel aggregates (one multi-column scatter-add) -----------
    (weight_sum, n_old, svx, svy, svz, static_contrib, count) = (
        _scatter_add_cols(
            cell, valid,
            (
                jnp.where(valid, w, 0.0),
                old,
                jnp.where(old, particles.vx, 0.0),
                jnp.where(old, particles.vy, 0.0),
                jnp.where(old, particles.vz, 0.0),
                jnp.where(old & ~moving, w, 0.0),
                valid,
            ),
            Vs,
        )
    )
    denom = jnp.maximum(n_old, 1.0)
    vel_avg = jnp.stack([svx / denom, svy / denom, svz / denom], axis=-1) * (
        n_old > 0
    )[:, None]

    # ---- future-status prediction (dsp_dynamic.h:950-964) --------------
    future = future_in + static_contrib[None, :]
    m_i, m_ok, n_moving, fm_over = compact_mask(moving, cfg.mover_capacity)
    m_px, m_py, m_pz = (particles.px[m_i], particles.py[m_i],
                        particles.pz[m_i])
    m_vx, m_vy, m_vz = (particles.vx[m_i], particles.vy[m_i],
                        particles.vz[m_i])
    m_w = jnp.where(m_ok, w[m_i], 0.0)
    if shard is not None:
        (m_px, m_py, m_pz, m_vx, m_vy, m_vz, m_w, m_ok) = jax.tree.map(
            shard.gather_flat, (m_px, m_py, m_pz, m_vx, m_vy, m_vz, m_w, m_ok)
        )
    taus = jnp.asarray(cfg.prediction_horizons, jnp.float32)
    fx = m_px[None, :] + m_vx[None, :] * taus[:, None]
    fy = m_py[None, :] + m_vy[None, :] * taus[:, None]
    fz = m_pz[None, :] + m_vz[None, :] * taus[:, None]
    fwx, fwy, fwz = geometry.world_voxel_planar(fx, fy, fz, cfg)
    ok = m_ok[None, :] & geometry.in_window_planar(fwx, fwy, fwz, origin, cfg)
    fcell = geometry.storage_index_planar(fwx, fwy, fwz, cfg)
    if shard is not None:
        ok = ok & shard.owns(fcell, Vs)
        fcell = fcell - shard.lo
    fidx = jnp.where(
        ok, fcell + Vs * jnp.arange(T, dtype=jnp.int32)[:, None], T * Vs
    )
    future = (
        future.reshape(-1)
        .at[fidx.ravel()]
        .add(jnp.broadcast_to(m_w[None, :], fidx.shape).ravel(), mode="drop")
        .reshape(T, Vs)
    )

    # ---- systematic resampling on the cell-sorted population ----------
    key = jnp.where(valid, cell, I32_MAX)
    iota = jnp.arange(P, dtype=jnp.int32)
    sorted_key, order, w_s = jax.lax.sort(
        (key, iota, jnp.where(valid, w, 0.0)), is_stable=True, num_keys=1
    )
    valid_s = sorted_key < I32_MAX
    cell_s = jnp.minimum(sorted_key, Vs - 1)

    count_r = count[cell_s]
    wsum_r = weight_sum[cell_s]
    do_rs = valid_s & (count_r >= cfg.resample_min_count)
    n_target = jnp.minimum(count_r, cfg.max_particles_per_voxel)
    wa = jnp.where(do_rs, wsum_r / jnp.maximum(n_target, 1.0), 1.0)

    cum = jnp.cumsum(w_s)
    is_start = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    base = jax.lax.cummax(jnp.where(is_start, cum - w_s, 0.0))
    hi = cum - base
    lo = hi - w_s

    def n_grid(x):  # grid points wa*(k+1/2) strictly below x
        return jnp.maximum(jnp.ceil(x / wa - 0.5), 0.0).astype(jnp.int32)

    copies = jnp.where(do_rs, n_grid(hi) - n_grid(lo), 0)
    kept = do_rs & (copies >= 1)
    dropped = do_rs & (copies == 0)
    extra = jnp.maximum(copies - 1, 0)
    survivor = valid_s & ~dropped

    # per-voxel dropped/extra totals (second small scatter-add)
    tot_dropped, tot_extra = _scatter_add_cols(
        cell_s, valid_s, (dropped, extra), Vs
    )
    ce = jnp.cumsum(extra)
    base_e = jax.lax.cummax(jnp.where(is_start, (ce - extra).astype(
        jnp.float32), 0.0)).astype(jnp.int32)
    demand_start = ce - extra - base_e
    total_free = jnp.maximum(
        S - count_r + tot_dropped[cell_s].astype(jnp.int32), 0
    ).astype(jnp.int32)
    placed = jnp.clip(total_free - demand_start, 0, extra)
    unplaced = (extra - placed).astype(jnp.float32)
    new_w = jnp.where(kept, wa * (1.0 + unplaced), w_s)

    # ---- output construction (defragmented, cell-sorted) ---------------
    surv_pos = jnp.cumsum(survivor.astype(jnp.int32)) - survivor
    n_surv = jnp.sum(survivor)
    copy_prefix = jnp.cumsum(placed) - placed
    copy_start = n_surv + copy_prefix
    n_copies = jnp.sum(placed)
    n_out = jnp.minimum(n_surv + n_copies, P)

    src_surv = (
        jnp.zeros((P,), jnp.int32)
        .at[jnp.where(survivor, surv_pos, P)]
        .set(iota, mode="drop", unique_indices=True)
    )
    src_copy = jax.lax.cummax(
        jnp.zeros((P,), jnp.int32)
        .at[jnp.where(placed > 0, copy_start, P)]
        .max(iota, mode="drop", unique_indices=True)
    )
    is_copy = iota >= n_surv
    src_sorted = jnp.where(is_copy, src_copy, src_surv)
    out_valid = iota < n_out
    orig = order[src_sorted]  # sorted position -> original row

    pay = jnp.stack(
        [particles.px, particles.py, particles.pz,
         particles.vx, particles.vy, particles.vz]
        + ([particles.t] if cfg.record_particle_time else []),
        axis=0,
    )  # [F, P]
    got = pay[:, orig]  # [F, P] row gathers from the small stack
    w_out = jnp.where(
        out_valid, jnp.where(is_copy, wa[src_sorted], new_w[src_sorted]), 0.0
    )
    flags_out = jnp.where(out_valid, FLAG_VALID, jnp.int32(0))
    z = jnp.zeros((P,), jnp.float32)
    msk = lambda x: jnp.where(out_valid, x, 0.0)  # noqa: E731
    new_particles = dataclasses.replace(
        particles,
        flags=flags_out,
        px=msk(got[0]), py=msk(got[1]), pz=msk(got[2]),
        vx=msk(got[3]), vy=msk(got[4]), vz=msk(got[5]),
        weight=w_out,
        t=msk(got[6]) if cfg.record_particle_time else particles.t,
    )

    stats = {
        "alive": n_out,
        "culled": jnp.sum(culled),
        "resampled_voxels": jnp.sum(
            (count >= cfg.resample_min_count) & (count > 0)
        ).astype(jnp.int32),
        "resample_dropped": jnp.sum(dropped),
        "resample_copies": n_copies,
        "pool_overflow": (n_surv + n_copies) - n_out,
        "future_moving": jnp.minimum(n_moving, cfg.mover_capacity),
        "future_overflow": fm_over,
    }
    return new_particles, weight_sum, vel_avg, future, stats
