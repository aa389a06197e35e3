"""Pallas TPU mega-kernel for the occupancy/cull/aggregate/resample pool
pass (``mapOccupancyCalculationAndResample``, dsp_dynamic.h:924-1057).

The XLA formulation (ops/occupancy.py) runs ~15 separate fusions over the
nine [S, V] particle planes: cull, per-voxel aggregates, two slot-axis
cumsums (reduce-windows), the S^2 copy-placement sweep and eight S-deep
placement selects.  All of it is columnwise over voxels with only tiny
slot-axis loops, so one kernel computes the whole stage per [S, L] tile at
one HBM read + one write of the pool (~2 ms -> ~0.5 ms on v5e).

Math is identical to ops/occupancy.py (asserted element-exact by
tests/test_pallas.py in interpret mode and by the shared callers on TPU):
slot-axis cumsums become S-step unrolled row loops (Mosaic has no cumsum
lowering, and rejects the small 2-D iotas a triangular-matmul formulation
would need); everything else is the same closed-form bucketing.  The
future-status scatter and the per-frame stats stay outside (they need
global gathers/scatters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MapConfig


def _kernel(*refs, cfg: MapConfig, S: int, V: int, n_vel: int, with_t: bool,
            with_moving: bool):
    # Optional planes (all statically configured): the particle-time plane
    # rides along only when ``cfg.record_particle_time`` (write-only state,
    # see config.py), the [S, L] ``moving`` mask is emitted only when the
    # caller has no pre-compacted future-mover set -- a Pallas output cannot
    # be dead-code-eliminated by XLA, so unused planes must not exist -- and
    # only the first ``n_vel`` velocity planes are carried: planes the
    # pipeline's velocity-clamp invariant makes identically zero (vz under
    # limit-xy, dsp_dynamic.h:661-663; all three in the static model,
    # dsp_static.h:640-646) are elided entirely, since a Pallas kernel
    # cannot constant-fold a zeros operand the way XLA does (each elided
    # plane saves a full pool read + write, ~1.1 ms/frame at large_urban's
    # 216 MB planes).
    n_in = 5 + n_vel + with_t
    flags_ref, w_ref, px_ref, py_ref, pz_ref = refs[:5]
    vel_refs = refs[5:5 + n_vel]
    t_ref = refs[5 + n_vel] if with_t else None
    outs = refs[n_in:]
    oflags_ref, ow_ref, opx_ref, opy_ref, opz_ref = outs[:5]
    ovel_refs = outs[5:5 + n_vel]
    k = 5 + n_vel
    ot_ref = outs[k] if with_t else None
    k += with_t
    omoving_ref = outs[k] if with_moving else None
    k += with_moving
    ows_ref, onold_ref = outs[k], outs[k + 1]
    ovs_refs = outs[k + 2 : k + 2 + n_vel]
    (ostatic_ref, onvalid_ref, onculled_ref, odors_ref, ondropped_ref,
     onfilled_ref) = outs[k + 2 + n_vel:]
    # flag logic in i32: the VPU has no 8-bit equality compare
    flags = flags_ref[...].astype(jnp.int32)
    w = w_ref[...]
    vels = [r[...] for r in vel_refs]

    valid0 = flags != 0
    cull = valid0 & (w < cfg.weight_cull_threshold)
    valid = valid0 & ~cull
    newborn = flags == 3
    old = valid & ~newborn
    if vels:
        mv = vels[0] != 0.0
        for v in vels[1:]:
            mv = mv | (v != 0.0)
        moving = old & mv
    else:
        moving = jnp.zeros_like(old)

    fvalid = valid.astype(jnp.float32)
    wv = w * fvalid
    weight_sum = jnp.sum(wv, axis=0)  # [L]
    fold = old.astype(jnp.float32)
    n_old = jnp.sum(fold, axis=0)
    for ovs_ref, v in zip(ovs_refs, vels):
        ovs_ref[...] = jnp.sum(v * fold, axis=0)
    ostatic_ref[...] = jnp.sum(w * (old & ~moving).astype(jnp.float32), axis=0)
    ows_ref[...] = weight_sum
    onold_ref[...] = n_old
    if with_moving:
        omoving_ref[...] = moving

    # Per-voxel stats counters (metrics surface): computed here from the
    # in-VMEM masks so the caller's stats dict never re-reads the pool
    # planes (those re-reads were ~2 ms/frame at large_urban's 216 MB
    # planes; round-4 trace at ops/occupancy.py:247,257).
    onvalid_ref[...] = jnp.sum(fvalid, axis=0)
    onculled_ref[...] = jnp.sum(cull.astype(jnp.float32), axis=0)

    # ---- systematic resampling (dsp_dynamic.h:986-1055) ----------------
    count = jnp.sum(fvalid, axis=0)
    do_rs = count >= cfg.resample_min_count
    odors_ref[...] = do_rs.astype(jnp.float32)

    pairs = [(px_ref, opx_ref), (py_ref, opy_ref), (pz_ref, opz_ref)]
    pairs += list(zip(vel_refs, ovel_refs))
    if with_t:
        pairs.append((t_ref, ot_ref))

    # The resample math is the kernel's VPU cost: three S-step row cumsums,
    # the S^2 copy-placement sweep and S-deep placement selects -- O(S^2 L)
    # work where everything else is O(S L).  Resampling only fires in voxels
    # holding >= resample_min_count survivors, which cluster around observed
    # surfaces; most [S, L] tiles of the pool contain none (street scene:
    # ~85-95% of tiles skip).  Predicate the whole block per tile.  On the
    # last tile of a non-multiple V the padding lanes hold UNDEFINED data
    # (Pallas TPU makes no zero-fill promise), so the reduce must see only
    # real voxels -- a garbage lane could otherwise flip any_rs and defeat
    # the skip nondeterministically (per-lane outputs are still gated by
    # do_rs_b, so correctness never depended on this).
    L = w.shape[1]
    if V % L:
        col = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        in_bounds = (pl.program_id(0) * L + col) < V  # [S, L]
        any_rs = jnp.any(do_rs[None, :] & in_bounds)
    else:
        any_rs = jnp.any(do_rs)

    @pl.when(any_rs)
    def _resample():
        n_target = jnp.minimum(count, float(cfg.max_particles_per_voxel))
        wa = jnp.where(do_rs, weight_sum / jnp.maximum(n_target, 1.0), 1.0)
        # Materialized [S, L] copy of the per-voxel mask: Mosaic cannot
        # relayout an i1 vector whose broadcast dimension is replicated, so
        # build it through f32 arithmetic.
        do_rs_b = (jnp.zeros_like(w) + do_rs.astype(jnp.float32)[None, :]) > 0.0

        # slot-axis inclusive cumsum: S-step unrolled row loop (S is small;
        # Mosaic has no cumsum lowering and rejects small 2-D iotas)
        def cumsum_rows(x):
            acc = x[0:1, :]
            rows = [acc]
            for s in range(1, S):
                acc = acc + x[s : s + 1, :]
                rows.append(acc)
            return jnp.concatenate(rows, axis=0)

        hi = cumsum_rows(wv)  # [S, L]
        lo = hi - wv

        def n_grid(x):  # grid points wa*(k+1/2) strictly below x
            return jnp.maximum(jnp.ceil(x / wa - 0.5), 0.0)

        copies = jnp.where(valid & do_rs_b, n_grid(hi) - n_grid(lo), 0.0)
        kept = valid & do_rs_b & (copies >= 1.0)
        dropped = valid & do_rs_b & (copies == 0.0)
        extra = jnp.maximum(copies - 1.0, 0.0)

        is_free = ((~valid) | dropped).astype(jnp.float32)
        free_cum = cumsum_rows(is_free)
        free_rank = free_cum - is_free
        total_free = free_cum[S - 1]
        demand_end = cumsum_rows(extra)
        total_extra = demand_end[S - 1]

        # copy placement: free slot of rank r sources particle j with
        # demand_end[j-1] <= r < demand_end[j]
        src_idx = jnp.zeros_like(free_rank)
        for j in range(S):
            de_j = jnp.zeros_like(free_rank) + demand_end[j][None, :]
            src_idx = src_idx + (de_j <= free_rank).astype(jnp.float32)
        lim = jnp.zeros_like(free_rank) + jnp.minimum(
            total_extra, total_free
        )[None, :]
        filled = ((~valid) | dropped) & (free_rank < lim) & do_rs_b

        # fold-back for copies that found no space (dsp_dynamic.h:1037-1041)
        demand_start = demand_end - extra
        placed = jnp.clip(total_free[None, :] - demand_start, 0.0, extra)
        unplaced = extra - placed

        new_w = jnp.where(kept, wa * (1.0 + unplaced), w)
        new_w = jnp.where(filled, wa[None, :] * jnp.ones_like(w), new_w)
        base_flags = jnp.where(cull, 0, flags)
        new_flags = jnp.where(valid, 1, base_flags)
        new_flags = jnp.where(dropped, 0, new_flags)
        new_flags = jnp.where(filled, 1, new_flags)

        oflags_ref[...] = new_flags.astype(jnp.int32)
        ow_ref[...] = new_w

        # Stats-surface set semantics (ops/occupancy.py): a dropped slot
        # REFILLED by a copy ends alive, so it counts in neither
        # "resample_dropped" (survivor & ~new_valid) nor "resample_copies"
        # (~survivor & new_valid); both adjust by the same intersection, so
        # alive = n_valid - n_dropped + n_filled still holds.
        ondropped_ref[...] = jnp.sum(
            (dropped & ~filled).astype(jnp.float32), axis=0)
        onfilled_ref[...] = jnp.sum(
            (filled & ~valid).astype(jnp.float32), axis=0)

        # One placement loop for all planes: the (src_idx == j) compare is
        # shared across the 6-7 copied fields instead of recomputed per plane
        # (the kernel is VPU-bound on exactly these selects; docs/PERF.md).
        fields = [f_ref[...] for f_ref, _ in pairs]
        sels = [jnp.broadcast_to(f[0][None, :], f.shape) for f in fields]
        for j in range(1, S):
            hit = src_idx == j
            sels = [jnp.where(hit, f[j][None, :], s)
                    for f, s in zip(fields, sels)]
        for (f_ref, o_ref), f, s in zip(pairs, fields, sels):
            o_ref[...] = jnp.where(filled, s, f)

    @pl.when(jnp.logical_not(any_rs))
    def _no_resample():
        # No voxel in this tile resamples: copies == 0 for every slot, so
        # kept/dropped/filled are all False -- the cull + newborn-reset
        # flag update and an unchanged weight/payload copy are exact.
        base_flags = jnp.where(cull, 0, flags)
        oflags_ref[...] = jnp.where(valid, 1, base_flags).astype(jnp.int32)
        ow_ref[...] = w
        ondropped_ref[...] = jnp.zeros_like(count)
        onfilled_ref[...] = jnp.zeros_like(count)
        for f_ref, o_ref in pairs:
            o_ref[...] = f_ref[...]


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "with_moving")
)
def occupancy_pool_pass(particles, cfg: MapConfig, interpret: bool = False,
                        with_moving: bool = True):
    """One-pass cull + aggregates + resample over the pool.

    Returns ``(new_fields dict, weight_sum[V], n_old[V], vel_sums[V,3],
    static_contrib[V], moving[S, V] | None, counters)`` where ``counters =
    (n_valid, n_culled, do_rs, n_dropped, n_filled)`` are per-voxel [V]
    stats vectors -- the caller (ops/occupancy.py) derives vel_avg, the
    future grids and the stats dict without re-reading the pool planes.
    ``with_moving=False`` elides the [S, V] moving-mask output (callers with
    a pre-compacted future-mover set never read it); the particle-time plane
    is carried only when ``cfg.record_particle_time``.
    """
    S, V = particles.flags.shape
    # Tile width by slot depth: the block pipeline holds ~20 [S, L] buffers
    # double-buffered, so deep-slot pools need narrow tiles to fit VMEM;
    # shallow pools take wider tiles to cut grid-step and DMA-issue
    # overhead (~1-3 us per transfer, docs/PERF.md round 4 -- at
    # large_urban's S=10 the L=2048 grid ran 2656 steps).
    L = 4096 if S <= 16 else (2048 if S <= 32 else 1024)
    grid = (pl.cdiv(V, L),)
    with_t = bool(cfg.record_particle_time)
    # Velocity planes made identically zero by the pipeline's clamp
    # invariant (models/pipeline.py) are elided from the kernel I/O; the
    # caller substitutes the particles' own (constant-zero) planes and
    # zero aggregates.  Exactness relies on that invariant -- direct
    # callers must feed conforming pools (the test suites do).
    if cfg.motion_model == "static":
        n_vel = 0
    elif cfg.limit_motion_to_xy_plane:
        n_vel = 2
    else:
        n_vel = 3
    vel_in = (particles.vx, particles.vy, particles.vz)[:n_vel]

    def bspec():
        return pl.BlockSpec((S, L), lambda b: (0, b), memory_space=pltpu.VMEM)

    def vspec():
        return pl.BlockSpec((L,), lambda b: (b,), memory_space=pltpu.VMEM)

    n_planes = 5 + n_vel + with_t  # in: flags,w,pos,vel[:n_vel][,t]
    n_aggs = 8 + n_vel  # ws, n_old, vel sums, static, 5 stats counters
    out_shape = (
        [jax.ShapeDtypeStruct((S, V), jnp.int32)]
        + [jax.ShapeDtypeStruct((S, V), jnp.float32)
           for _ in range(n_planes - 1)]
        + ([jax.ShapeDtypeStruct((S, V), jnp.bool_)] if with_moving else [])
        + [jax.ShapeDtypeStruct((V,), jnp.float32) for _ in range(n_aggs)]
    )
    operands = [particles.flags, particles.weight, particles.px, particles.py,
                particles.pz, *vel_in]
    if with_t:
        operands.append(particles.t)

    outs = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, S=S, V=V, n_vel=n_vel,
                          with_t=with_t, with_moving=with_moving),
        grid=grid,
        in_specs=[bspec() for _ in range(n_planes)],
        out_specs=(
            [bspec() for _ in range(n_planes + with_moving)]
            + [vspec() for _ in range(n_aggs)]
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    flags, w, px, py, pz = outs[:5]
    vel_out = list(outs[5:5 + n_vel])
    vel_out += [getattr(particles, n) for n in ("vx", "vy", "vz")[n_vel:]]
    vx, vy, vz = vel_out
    k = 5 + n_vel
    t = outs[k] if with_t else particles.t
    k += with_t
    moving = outs[k] if with_moving else None
    k += with_moving
    ws, n_old = outs[k], outs[k + 1]
    vsums = list(outs[k + 2 : k + 2 + n_vel])
    vsums += [jnp.zeros((V,), jnp.float32)] * (3 - n_vel)
    vsx, vsy, vsz = vsums
    (static_contrib, n_valid, n_culled, do_rs,
     n_dropped, n_filled) = outs[k + 2 + n_vel:]
    fields = dict(flags=flags, weight=w, px=px, py=py, pz=pz,
                  vx=vx, vy=vy, vz=vz, t=t)
    counters = (n_valid, n_culled, do_rs, n_dropped, n_filled)
    return (fields, ws, n_old, (vsx, vsy, vsz), static_contrib, moving,
            counters)
