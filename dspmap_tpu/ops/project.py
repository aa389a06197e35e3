"""Observation ingest: rotate the depth cloud, FOV-filter it and bin it into
pyramid cells (``update`` first half, ``include/dsp_dynamic.h:234-293``).

Output tensors are dense ``[n_pyramids, K]`` grids (K = per-pyramid point
capacity, dsp_dynamic.h:69) feeding the measurement update, plus the
per-pyramid max range used for occlusion reasoning (``dsp_dynamic.h:275-277``).

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
from .common import sort_by_destination, segment_counts


class Observation(NamedTuple):
    """Binned measurement for one frame (all world-frame)."""

    points: jnp.ndarray  # f32 [n_pyr, K, 3] world positions
    mask: jnp.ndarray  # bool [n_pyr, K]
    counts: jnp.ndarray  # i32 [n_pyr]
    max_range: jnp.ndarray  # f32 [n_pyr]; -1 where empty (dsp_dynamic.h:237)
    n_valid_points: jnp.ndarray  # i32 scalar: in-FOV points before capacity
    cloud_world: jnp.ndarray  # f32 [P, 3] rotated+translated input cloud
    cloud_valid: jnp.ndarray  # bool [P] in-FOV mask (pre-capacity)


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

    # Capacity-K binning: stable sort by pyramid, keep first K per pyramid.
    order, sorted_pyr, ranks = sort_by_destination(pyr, valid)
    keep = (sorted_pyr < n_pyr) & (ranks < K)
    slot = jnp.where(keep, sorted_pyr * K + ranks, n_pyr * K)
    grid = (
        jnp.zeros((n_pyr * K, 3), jnp.float32)
        .at[slot]
        .set(world[order], mode="drop")
        .reshape(n_pyr, K, 3)
    )
    mask = (
        jnp.zeros((n_pyr * K,), bool).at[slot].set(True, mode="drop").reshape(n_pyr, K)
    )
    return Observation(
        points=grid,
        mask=mask,
        counts=jnp.minimum(counts_all, K),
        max_range=max_range,
        n_valid_points=n_valid,
        cloud_world=world,
        cloud_valid=valid,
    )
