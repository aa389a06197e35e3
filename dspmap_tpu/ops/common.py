"""Fixed-shape building blocks: masked compaction and within-group ranking.

These two primitives replace the reference's serial slot scans
(``include/dsp_dynamic.h:1183-1259``): where the reference walks arrays looking
for free slots one particle at a time, we compact the candidates, sort them by
destination, and rank them within each destination group -- all fixed-shape,
all parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_mask(mask: jnp.ndarray, capacity: int):
    """Compact the True positions of a flat boolean ``mask`` into a fixed-size
    index buffer.

    Returns ``(indices[capacity], valid[capacity], n_selected, n_overflow)``:
    ``indices[i]`` is the position of the i-th True element (first-to-last
    order); entries beyond ``n_selected`` are invalid.  True elements beyond
    ``capacity`` are counted in ``n_overflow`` (the caller decides whether
    overflow means "drop" or "kill", mirroring the reference's
    drop-on-full semantics, dsp_dynamic.h:1198-1200).
    """
    mask = mask.ravel()
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1  # inclusive rank of each True
    n_selected = jnp.where(mask.size > 0, ranks[-1] + 1, 0)
    dest = jnp.where(mask & (ranks < capacity), ranks, capacity)
    indices = (
        jnp.full((capacity + 1,), 0, jnp.int32)
        .at[dest]
        .set(jnp.arange(mask.size, dtype=jnp.int32), mode="drop")[:capacity]
    )
    valid = jnp.arange(capacity, dtype=jnp.int32) < n_selected
    n_kept = jnp.minimum(n_selected, capacity)
    return indices, valid, n_kept, n_selected - n_kept


def group_ranks(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal keys (keys must be sorted).

    ``rank[i] = i - first_occurrence(sorted_keys[i])`` via a searchsorted on
    the array against itself.
    """
    n = sorted_keys.shape[0]
    first = jnp.searchsorted(sorted_keys, sorted_keys, side="left")
    return jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)


def sort_by_destination(dest: jnp.ndarray, valid: jnp.ndarray):
    """Stable-sort candidate indices by destination id, invalid entries last.

    Returns ``(order, sorted_dest, ranks)`` where ``order`` permutes the
    candidates, ``sorted_dest`` has invalid entries replaced by ``INT32_MAX``
    sentinels, and ``ranks`` is the within-destination arrival rank (stable =
    original candidate order, matching the reference's first-come slot
    filling).
    """
    sentinel = jnp.int32(2**31 - 1)
    keys = jnp.where(valid, dest, sentinel)
    order = jnp.argsort(keys, stable=True)
    sorted_dest = keys[order]
    ranks = group_ranks(sorted_dest)
    return order, sorted_dest, ranks


def segment_counts(ids: jnp.ndarray, valid: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Count of valid entries per segment id (scatter-add of ones)."""
    safe = jnp.where(valid, ids, num_segments)
    return (
        jnp.zeros((num_segments + 1,), jnp.int32)
        .at[safe]
        .add(1, mode="drop")[:num_segments]
    )
