"""DMA relayout kernels: pool planes between tiled ``[S, V]`` and flat
``[S*V]`` at HBM bandwidth.

Why these exist: every pool scatter (particle insertion, overflow kills, the
measurement-update weight writeback) is linearized by XLA TPU into a flat
``[S*V]`` scatter, with a relayout copy of the whole plane on each side.
For planes that fit VMEM (~16 MB) XLA's relayout is a single fast copy
(~0.04 ms at the flagship's 12.5 MB planes); for bigger planes it falls off
a cliff into a chunked while/dynamic-update-slice loop at ~35 GB/s
(measured: 0.2-0.4 ms per relayout at the multi-neighbor variant's 18 MB
planes, ~12 ms at large_urban's 216 MB -- dominating that config's frame).

Kernel shape (driven by Mosaic's slicing rules -- 2-D memref/VMEM slices
must be 8-aligned on the sublane dim, so per-row DMA of an 18- or 60-row
plane is not expressible):

* grid over (row groups of 8) x (column blocks ``Vc``);
* the tiled side rides the normal Pallas block pipeline with an ``(8, Vc)``
  block (the pipeline handles edge masking for ``S % 8 != 0``);
* rows are staged through a 1-D VMEM scratch with static value copies;
* the flat side moves via one manual DMA per row: 1-D slices at offsets
  ``(8g + r)*V + j*Vc``, which are 1024-aligned because ``V =
  cfg.storage_voxels`` is 1024-padded and ``Vc`` is a 1024-multiple
  divisor;
* the flat-side DMAs are double-buffered across grid steps (two scratch
  slots; each step launches into one slot and only waits for the slot it
  is about to reuse), overlapping them with the next block's staging.

No reference counterpart (the reference's single static array has no layout
problem, dsp_dynamic.h:116); this is TPU memory-system plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_vc(V: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest 1024-multiple divisor of V whose (8, Vc) f32 block fits the
    budget (two slots of 8*Vc scratch live at once for double buffering)."""
    best = 1024
    for vc in range(1024, V + 1, 1024):
        if V % vc == 0 and vc * 8 * 4 <= budget_bytes:
            best = vc
    return best


def _to_flat_kernel(in_ref, out_hbm, scratch, sems, *, S, V, Vc):
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    step = g * n_j + j
    slot = step % 2
    total = ((S + 7) // 8) * n_j
    full = S // 8

    def emit(n_rows):
        # Per-row wait -> stage -> start: row r's outbound DMA launches
        # while row r+1 still waits on its slot, instead of the serial
        # wait-all / stage-all / start-all hump (measured ~375 GB/s at
        # large_urban; the humps left the DMA engines idle between steps).
        for r in range(n_rows):
            @pl.when(step >= 2)
            def _(r=r):
                pltpu.make_async_copy(
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    sems.at[slot * 8 + r],
                ).wait()
            scratch[pl.ds(slot * 8 * Vc + r * Vc, Vc)] = in_ref[r, :]
            pltpu.make_async_copy(
                scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                out_hbm.at[pl.ds((8 * g + r) * V + j * Vc, Vc)],
                sems.at[slot * 8 + r],
            ).start()
        # rows beyond n_rows on this slot: self-copy so the final drain's
        # unconditional waits always have a matching signal (their slot-
        # reuse wait must still happen first -- same per-row discipline)
        for r in range(n_rows, 8):
            @pl.when(step >= 2)
            def _(r=r):
                pltpu.make_async_copy(
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    sems.at[slot * 8 + r],
                ).wait()
            pltpu.make_async_copy(
                scratch.at[pl.ds(slot * 8 * Vc, Vc)],
                scratch.at[pl.ds(slot * 8 * Vc, Vc)],
                sems.at[slot * 8 + r],
            ).start()
        # final steps: drain both slots before the kernel retires
        @pl.when(step >= total - 2)
        def _():
            for r in range(8):
                pltpu.make_async_copy(
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                    sems.at[slot * 8 + r],
                ).wait()

    if S % 8:
        @pl.when(g < full)
        def _():
            emit(8)

        @pl.when(g == full)
        def _():
            emit(S % 8)
    else:
        emit(8)


def _from_flat_kernel(in_hbm, out_ref, scratch, sems, *, S, V, Vc):
    """Prefetched: each step issues the NEXT block's flat-side DMAs into the
    other scratch slot before waiting on its own, overlapping the loads with
    this block's staging copies.  Row offsets for the (possibly edge) next
    group clamp to the last valid row -- the extra reads land in scratch
    rows that Pallas masks out of the edge output block anyway."""
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    n_g = pl.num_programs(0)
    step = g * n_j + j
    slot = step % 2
    total = n_g * n_j

    def issue(for_step, into_slot):
        gg = for_step // n_j
        jj = for_step % n_j
        for r in range(8):
            row = jnp.minimum(8 * gg + r, S - 1)
            pltpu.make_async_copy(
                in_hbm.at[pl.ds(row * V + jj * Vc, Vc)],
                scratch.at[pl.ds(into_slot * 8 * Vc + r * Vc, Vc)],
                sems.at[into_slot * 8 + r],
            ).start()

    @pl.when(step == 0)
    def _():
        issue(0, 0)

    @pl.when(step + 1 < total)
    def _():
        issue(step + 1, (step + 1) % 2)

    n_rows = 8 if S % 8 == 0 else None
    if n_rows == 8:
        # per-row wait -> copy (see _to_flat_kernel's emit note)
        for r in range(8):
            pltpu.make_async_copy(
                scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                sems.at[slot * 8 + r],
            ).wait()
            out_ref[r, :] = scratch[pl.ds(slot * 8 * Vc + r * Vc, Vc)]
    else:
        full = S // 8
        for r in range(8):
            pltpu.make_async_copy(
                scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                scratch.at[pl.ds(slot * 8 * Vc + r * Vc, Vc)],
                sems.at[slot * 8 + r],
            ).wait()

            @pl.when(g < full)
            def _(r=r):
                out_ref[r, :] = scratch[pl.ds(slot * 8 * Vc + r * Vc, Vc)]

            @pl.when(g == full)
            def _(r=r):
                src = r if r < S % 8 else 0
                out_ref[r, :] = scratch[pl.ds(slot * 8 * Vc + src * Vc, Vc)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def to_flat(plane: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``[S, V]`` (tiled) -> ``[S*V]`` row-major flat.  V % 1024 == 0."""
    S, V = plane.shape
    Vc = _pick_vc(V)
    n_groups = (S + 7) // 8
    return pl.pallas_call(
        functools.partial(_to_flat_kernel, S=S, V=V, Vc=Vc),
        grid=(n_groups, V // Vc),
        in_specs=[pl.BlockSpec((8, Vc), lambda g, j: (g, j))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((S * V,), plane.dtype),
        scratch_shapes=[pltpu.VMEM((2 * 8 * Vc,), plane.dtype),
                        pltpu.SemaphoreType.DMA((16,))],
        interpret=interpret,
    )(plane)


@functools.partial(jax.jit, static_argnames=("S", "V", "interpret"))
def from_flat(flat: jnp.ndarray, S: int, V: int,
              interpret: bool = False) -> jnp.ndarray:
    """``[S*V]`` row-major flat -> ``[S, V]`` (tiled).  V % 1024 == 0."""
    Vc = _pick_vc(V)
    n_groups = (S + 7) // 8
    return pl.pallas_call(
        functools.partial(_from_flat_kernel, S=S, V=V, Vc=Vc),
        grid=(n_groups, V // Vc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, Vc), lambda g, j: (g, j)),
        out_shape=jax.ShapeDtypeStruct((S, V), flat.dtype),
        scratch_shapes=[pltpu.VMEM((2 * 8 * Vc,), flat.dtype),
                        pltpu.SemaphoreType.DMA((16,))],
        interpret=interpret,
    )(flat)
