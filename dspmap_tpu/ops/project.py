"""Observation ingest: rotate the depth cloud, FOV-filter it and bin it into
pyramid cells (``update`` first half, ``include/dsp_dynamic.h:234-293``).

Output tensors are a dense ``[n_pyramids, Ko]`` grid (Ko = the update's dense
observation tier, config.py) plus a compacted *spill* buffer for the points
ranked between Ko and the reference's per-pyramid drop threshold K
(dsp_dynamic.h:69).  The split is a processing layout, not a semantics
change: the drop threshold stays at K.  Also emits the per-pyramid max range
used for occlusion reasoning (``dsp_dynamic.h:275-277``).

Capacity deviation (documented): on overflow the reference keeps the first
K-1 points and lets every subsequent point overwrite slot K-1
(``dsp_dynamic.h:281-284``); we keep the first K.  The readme advises
voxel-filtering the input so overflow does not happen in normal operation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import MapConfig
from .. import geometry
from .common import compact_mask, sort_by_destination, segment_counts


class Observation(NamedTuple):
    """Binned measurement for one frame (all world-frame)."""

    points: jnp.ndarray  # f32 [n_pyr, Ko, 3] world positions (dense tier)
    mask: jnp.ndarray  # bool [n_pyr, Ko]
    counts: jnp.ndarray  # i32 [n_pyr] (pre-tier, capped at K)
    max_range: jnp.ndarray  # f32 [n_pyr]; -1 where empty (dsp_dynamic.h:237)
    n_valid_points: jnp.ndarray  # i32 scalar: in-FOV points before capacity
    cloud_world: jnp.ndarray  # f32 [P, 3] rotated+translated input cloud
    cloud_valid: jnp.ndarray  # bool [P] in-FOV mask (pre-capacity)
    #: spill tier: the few cells holding more than Ko points get a compacted
    #: per-cell tile of their ranks [Ko, K) (see config.py tier rationale)
    spill_cells: jnp.ndarray  # i32 [Yc] pyramid ids of spilled cells
    spill_cell_mask: jnp.ndarray  # bool [Yc]
    spill_pts: jnp.ndarray  # f32 [Yc, K-Ko, 3]
    spill_pts_mask: jnp.ndarray  # bool [Yc, K-Ko]
    spill_overflow: jnp.ndarray  # i32 scalar: points dropped beyond Yc cells


def project_points(
    points_body: jnp.ndarray,  # [P, 3] sensor/body-frame points
    point_valid: jnp.ndarray,  # [P] input validity (padding mask)
    sensor_pos: jnp.ndarray,  # [3]
    quat: jnp.ndarray,  # [4] wxyz body->world
    cfg: MapConfig,
) -> Observation:
    """Bin one frame's point cloud into FOV pyramid cells.

    The reference rotates each body-frame point into the world-aligned ego
    frame and tests it against attitude-rotated FOV planes
    (dsp_dynamic.h:244-263); testing the *unrotated* point against the fixed
    planes is identical, so the pyramid index comes straight from the
    closed-form cylindrical angles of the body-frame point.
    """
    n_pyr, K = cfg.n_pyramids, cfg.max_obs_points_per_pyramid
    Ko, o_cap = cfg.obs_dense, cfg.obs_spill_capacity

    pyr, in_fov = geometry.pyramid_index(points_body, cfg)
    valid = point_valid & in_fov
    n_valid = jnp.sum(valid).astype(jnp.int32)

    world = sensor_pos + geometry.quaternion_rotate(quat, points_body)
    rng = jnp.linalg.norm(points_body, axis=-1)  # ego range (dsp_dynamic.h:266)

    # Per-pyramid max range for occlusion (scatter-max, dsp_dynamic.h:275-277).
    safe_pyr = jnp.where(valid, pyr, n_pyr)
    max_range = (
        jnp.full((n_pyr + 1,), -1.0, jnp.float32)
        .at[safe_pyr]
        .max(jnp.where(valid, rng, -1.0), mode="drop")[:n_pyr]
    )
    counts_all = segment_counts(pyr, valid, n_pyr)

    # Capacity-K binning: stable sort by pyramid, keep first K per pyramid
    # (the reference's drop threshold); ranks below the dense tier Ko go to
    # the dense grid, ranks in [Ko, K) are compacted into the spill buffer.
    order, sorted_pyr, ranks = sort_by_destination(pyr, valid)
    world_sorted = world[order]
    in_grid = sorted_pyr < n_pyr
    keep = in_grid & (ranks < Ko)
    slot = jnp.where(keep, sorted_pyr * Ko + ranks, n_pyr * Ko)
    grid = (
        jnp.zeros((n_pyr * Ko, 3), jnp.float32)
        .at[slot]
        .set(world_sorted, mode="drop", unique_indices=True)
        .reshape(n_pyr, Ko, 3)
    )
    mask = (
        jnp.zeros((n_pyr * Ko,), bool)
        .at[slot]
        .set(True, mode="drop", unique_indices=True)
        .reshape(n_pyr, Ko)
    )

    Ks = K - Ko
    Yc = o_cap
    if Ks > 0:
        # Cells holding more than Ko points get a compacted [Ks]-point tile.
        cell_has_spill = counts_all > Ko
        cell_ids, cell_ok, _, cell_over = compact_mask(cell_has_spill, Yc)
        spill_cells = jnp.where(cell_ok, cell_ids, n_pyr).astype(jnp.int32)
        # inverse map cell -> tile row (sentinel Yc for non-spilled cells)
        inv = (
            jnp.full((n_pyr + 1,), Yc, jnp.int32)
            .at[spill_cells]
            .set(jnp.arange(Yc, dtype=jnp.int32), mode="drop")[:n_pyr]
        )
        sp_sel = in_grid & (ranks >= Ko) & (ranks < K)
        row = jnp.where(sp_sel, inv[jnp.minimum(sorted_pyr, n_pyr - 1)], Yc)
        tile_slot = jnp.where(row < Yc, row * Ks + (ranks - Ko), Yc * Ks)
        spill_pts = (
            jnp.zeros((Yc * Ks, 3), jnp.float32)
            .at[tile_slot]
            .set(world_sorted, mode="drop", unique_indices=True)
            .reshape(Yc, Ks, 3)
        )
        spill_pts_mask = (
            jnp.zeros((Yc * Ks,), bool)
            .at[tile_slot]
            .set(True, mode="drop", unique_indices=True)
            .reshape(Yc, Ks)
        )
        sp_over = jnp.sum(sp_sel & (row >= Yc))
    else:
        spill_cells = jnp.full((Yc,), n_pyr, jnp.int32)
        cell_ok = jnp.zeros((Yc,), bool)
        spill_pts = jnp.zeros((Yc, max(Ks, 1), 3), jnp.float32)
        spill_pts_mask = jnp.zeros((Yc, max(Ks, 1)), bool)
        sp_over = jnp.int32(0)

    return Observation(
        points=grid,
        mask=mask,
        counts=jnp.minimum(counts_all, K),
        max_range=max_range,
        n_valid_points=n_valid,
        cloud_world=world,
        cloud_valid=valid,
        spill_cells=spill_cells,
        spill_cell_mask=cell_ok,
        spill_pts=spill_pts,
        spill_pts_mask=spill_pts_mask,
        spill_overflow=sp_over,
    )
