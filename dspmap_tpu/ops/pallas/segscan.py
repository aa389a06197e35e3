"""Segmented-scan Pallas kernel for the compact particle core.

The compact layout's per-voxel math rides short-run segmented scans
(ops/compact.py `_seg_cumsum` / `_fill_from_end`): ~6 shifted-add steps,
each lowering to 3-4 XLA ops over tiny [P]-scale arrays.  On the tunneled
v5e every op carries a ~15-60 us fixed cost (docs/PERF.md round 5), so the
scans alone account for ~1.5-2 ms/frame of pure op overhead.  This kernel
runs the identical step sequence inside ONE program with the whole array
VMEM-resident (P <= 131k rows x a few columns is ~1-4 MB), reducing each
scan call to a single dispatch.

Arithmetic is the exact same Hillis-Steele recurrence in the same step
order as the XLA path, so results are bit-identical (pinned by
tests/test_pallas.py).

Layout: a flat [P] array is viewed as [R, 128] row-major; a flat shift by
``d < 128`` is a lane roll plus a row roll for the carried lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(x, d, fill):
    """result[i] = x[i - d] on the flat view (fill for i < d)."""
    R = x.shape[0]
    lr = pltpu.roll(x, d, axis=1)
    pr = pltpu.roll(lr, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    take_prev = lane < d
    y = jnp.where(take_prev, pr, lr)
    return jnp.where((row == 0) & take_prev, fill, y)


def _shift_up(x, d, fill):
    """result[i] = x[i + d] on the flat view (fill for i >= P - d).
    (``pltpu.roll`` takes non-negative shifts: a left-roll by d is a
    right-roll by size - d.)"""
    R = x.shape[0]
    lr = pltpu.roll(x, 128 - d, axis=1)
    nr = pltpu.roll(lr, R - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    take_next = lane >= 128 - d
    y = jnp.where(take_next, nr, lr)
    return jnp.where((row == R - 1) & take_next, fill, y)


def _segscan_kernel(start_ref, end_ref, x_ref, hi_ref, tot_ref, *, C, n_tot,
                    reach):
    # flags ride as i32 (Mosaic's dynamic_rotate has no 1-bit lowering)
    b0 = start_ref[:]
    e0 = end_ref[:]
    for c in range(C):
        s = x_ref[c]
        b = b0
        d = 1
        while d < reach:
            ps = _shift_down(s, d, 0.0)
            pb = _shift_down(b, d, 1)
            s = jnp.where(b != 0, s, s + ps)
            b = b | pb
            d *= 2
        hi_ref[c] = s
        if c < n_tot:
            # backward hold-last-marked fill of the run-end value
            t = s
            taken = e0
            d = 1
            while d < reach:
                ns = _shift_up(t, d, 0.0)
                nt = _shift_up(taken, d, 0)
                t = jnp.where(taken != 0, t, ns)
                taken = taken | nt
                d *= 2
            tot_ref[c] = t


#: tests flip this to run the kernel under the Pallas interpreter on CPU
INTERPRET = False


@functools.partial(jax.jit, static_argnames=("n_tot", "reach", "interpret"))
def _segscan_call(xs, is_start, is_end, n_tot, reach, interpret=False):
    C, P = xs.shape
    R = P // 128
    kern = functools.partial(
        _segscan_kernel, C=C, n_tot=n_tot, reach=reach
    )
    hi, tot = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((C, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((max(n_tot, 1), R, 128), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        is_start.reshape(R, 128).astype(jnp.int32),
        is_end.reshape(R, 128).astype(jnp.int32),
        xs.reshape(C, R, 128),
    )
    return hi.reshape(C, P), tot.reshape(max(n_tot, 1), P)


def seg_scans_pallas(cols, is_start, is_end, max_run, n_tot):
    """(hi per column, tot for the first ``n_tot`` columns) -- drop-in for
    the XLA `_seg_cumsum`/`_fill_from_end` pair over a column list.
    Requires ``P % 128 == 0`` and ``max_run``'s reach <= 128 (callers
    guarantee both; per-voxel runs are bounded by the slot capacity)."""
    reach = 1
    while reach < max_run:
        reach *= 2
    assert reach <= 128, "short-run bound exceeds the lane-shift window"
    xs = jnp.stack([c.astype(jnp.float32) for c in cols])  # [C, P]
    hi, tot = _segscan_call(xs, is_start, is_end, n_tot, reach,
                            interpret=INTERPRET)
    return (
        [hi[c] for c in range(len(cols))],
        [tot[c] for c in range(n_tot)],
    )
