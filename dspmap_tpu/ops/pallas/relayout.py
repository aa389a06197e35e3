"""DMA relayout kernels: pool planes between tiled ``[S, V]`` and flat
``[S*V]`` at HBM bandwidth.

Why these exist: every pool scatter (particle insertion, overflow kills, the
measurement-update weight writeback) is linearized by XLA TPU into a flat
``[S*V]`` scatter, with a relayout copy of the whole plane on each side.
For planes that fit VMEM (~16 MB) XLA's relayout is a single fast copy
(~0.04 ms at the flagship's 12.5 MB); for bigger planes it falls off a
cliff into a chunked while/dynamic-update-slice loop at ~35 GB/s
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
  divisor.

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
    """Largest 1024-multiple divisor of V with an (8, Vc) f32 block within
    budget (two such blocks live at once: pipeline buffer + scratch)."""
    best = 1024
    for vc in range(1024, V + 1, 1024):
        if V % vc == 0 and vc * 8 * 4 <= budget_bytes:
            best = vc
    return best


def _rows(S: int, g: int, n_groups: int) -> int:
    return S - 8 * g if g == n_groups - 1 and S % 8 else 8


def _to_flat_kernel(in_ref, out_hbm, scratch, sems, *, S, V, Vc):
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_groups = pl.num_programs(0)
    full = S // 8

    def emit(n_rows):
        for r in range(n_rows):
            scratch[pl.ds(r * Vc, Vc)] = in_ref[r, :]
        dmas = []
        for r in range(n_rows):
            d = pltpu.make_async_copy(
                scratch.at[pl.ds(r * Vc, Vc)],
                out_hbm.at[pl.ds((8 * g + r) * V + j * Vc, Vc)],
                sems.at[r],
            )
            d.start()
            dmas.append(d)
        for d in dmas:
            d.wait()

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
    g = pl.program_id(0)
    j = pl.program_id(1)
    full = S // 8

    def pull(n_rows):
        dmas = []
        for r in range(n_rows):
            d = pltpu.make_async_copy(
                in_hbm.at[pl.ds((8 * g + r) * V + j * Vc, Vc)],
                scratch.at[pl.ds(r * Vc, Vc)],
                sems.at[r],
            )
            d.start()
            dmas.append(d)
        for d in dmas:
            d.wait()
        for r in range(n_rows):
            out_ref[r, :] = scratch[pl.ds(r * Vc, Vc)]

    if S % 8:
        @pl.when(g < full)
        def _():
            pull(8)

        @pl.when(g == full)
        def _():
            pull(S % 8)
            # edge block: fill masked rows deterministically
            for r in range(S % 8, 8):
                out_ref[r, :] = scratch[pl.ds(0, Vc)]
    else:
        pull(8)


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
        scratch_shapes=[pltpu.VMEM((8 * Vc,), plane.dtype),
                        pltpu.SemaphoreType.DMA((8,))],
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
        scratch_shapes=[pltpu.VMEM((8 * Vc,), flat.dtype),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(flat)
