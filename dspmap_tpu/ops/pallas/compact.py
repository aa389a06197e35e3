"""Stream compaction as a Pallas TPU kernel.

Problem: "give me the flat indices (and payload) of the True entries of a
3.1M-element mask" is the backbone of rebin / FOV registration / future
scatter.  XLA's options measured on chip: scatter-by-rank ~19 ms (serialized
scatter), searchsorted ~21 ms (gather loop), full-pool stable sort ~7 ms.
The hardware can do it at memory bandwidth (~0.1 ms): this kernel does.

Mechanism (TPU grid is sequential, which we exploit twice):

* each grid step owns a ``[R, L]`` tile of the mask; within-tile ranks come
  from a lane cumsum plus row prefix sums,
* each row packs its selected entries to its front with a one-hot matmul on
  the MXU (exact for f32 payloads and for indices < 2^24),
* packed rows merge into a zeroed VMEM staging buffer at their running
  offsets via dynamic-slice stores (tails are zeroed so overlaps add
  cleanly),
* the staging buffer DMAs to the output at the block's global base offset,
  kept as carry in SMEM scratch across the sequential grid.  Each block
  writes its full tile width; the zero tail is overwritten by the next
  block's data (offsets are non-decreasing), so no masked HBM stores are
  needed.  The final tail beyond the total count is garbage by contract --
  callers mask with the returned count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compact_kernel(mask_ref, idx_out_ref, count_ref, base_ref, stage_ref,
                    sem, *, L, R, capacity):
    b = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        base_ref[0] = 0

    m = mask_ref[...].astype(jnp.float32)  # [R, L]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)

    # prefix sums as triangular matmuls (Mosaic has no cumsum primitive):
    # exclusive lane rank = m @ strict_upper, row totals via full reduce.
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    strict_upper = (li < lj).astype(jnp.float32)  # [L, L]
    lane_rank = jax.lax.dot_general(
        m, strict_upper,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [R, L]
    row_counts = jnp.sum(m, axis=1, keepdims=True)  # [R, 1] f32
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    strict_lower_r = (ri > rj).astype(jnp.float32)  # [R, R]
    row_prefix = jax.lax.dot_general(
        strict_lower_r, row_counts,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [R, 1] exclusive prefix

    # one-hot pack each row: A[r, l, j] = (lane_rank==j) & mask
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (R, L, L), 2)
    A = ((lane_rank[:, :, None] == j_iota) & (m[:, :, None] > 0.5)).astype(
        jnp.float32
    )
    flat_idx = (b * (R * L) + row * L + lane).astype(jnp.float32)  # exact < 2^24*4
    packed = jax.lax.dot_general(
        flat_idx[:, None, :], A,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]  # [R, L]

    # merge rows into the staging buffer at their running offsets
    stage_ref[...] = jnp.zeros((1, R * L), jnp.float32)
    for r in range(R):
        start = row_prefix[r, 0]
        stage_ref[0, pl.ds(start, L)] = (
            stage_ref[0, pl.ds(start, L)] + packed[r, :]
        )

    # DMA the tile to the global output at the running base
    base = base_ref[0]
    copy = pltpu.make_async_copy(
        stage_ref.at[0, pl.ds(0, R * L)],
        idx_out_ref.at[pl.ds(base, R * L)],
        sem,
    )
    copy.start()
    copy.wait()

    total = row_prefix[R - 1, 0] + row_counts[R - 1, 0].astype(jnp.int32)
    base_ref[0] = jnp.minimum(base + total, capacity)

    @pl.when(b == n_blocks - 1)
    def _():
        count_ref[0] = base_ref[0]


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def compact_indices_pallas(
    mask: jnp.ndarray, capacity: int, interpret: bool = False
):
    """Indices of True entries of ``mask`` (flat, ascending), Pallas fast path.

    Returns ``(idx[capacity] int32, count int32)``; entries beyond ``count``
    are garbage.  Selected entries beyond ``capacity`` are dropped.
    """
    mask = mask.ravel()
    N = mask.size
    R, L = 8, 1024
    K = R * L
    n_blocks = -(-N // K)
    pad = n_blocks * K - N
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])

    # output padded so a full tile write at base <= capacity never overflows
    out_size = capacity + K
    idx_f, count = pl.pallas_call(
        functools.partial(_compact_kernel, L=L, R=R, capacity=capacity),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_size,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, R * L), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mask.reshape(n_blocks * R, L))
    return idx_f[:capacity].astype(jnp.int32), jnp.minimum(count[0], capacity)
