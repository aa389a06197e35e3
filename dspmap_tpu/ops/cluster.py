"""Euclidean clustering as fixed-iteration label propagation.

The reference clusters non-ground points with a PCL KdTree +
``EuclideanClusterExtraction`` (``include/dsp_dynamic.h:1406-1417``): connected
components of the graph linking points within the cluster tolerance.  A KdTree
is a pointer-chasing structure with data-dependent shapes -- hostile to XLA --
so we compute the same components by iterated min-label propagation over the
pairwise-distance graph with pointer jumping (label doubling): each sweep a
point adopts the smallest label among its tolerance neighbors, then labels are
compressed through themselves twice, giving exponential reach per sweep.  For
the reference's point budget (<=5000 after voxel filtering,
``map_sim_example.cpp:48``) the distance rows are produced in chunks on the
MXU via the Gram-matrix identity; nothing is materialized at P^2 except one
boolean row block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_cluster(
    points: jnp.ndarray,  # [P, 3]
    valid: jnp.ndarray,  # [P] bool
    tolerance: float,
    iters: int = 16,
    row_chunk: int = 1024,
) -> jnp.ndarray:
    """Connected components under ``dist <= tolerance``.

    Returns ``labels[P]``: the index of each point's component representative
    (the smallest member index); invalid points get the sentinel ``P``.
    Equivalent to PCL euclidean cluster extraction before size filtering
    (dsp_dynamic.h:1406-1417).
    """
    P = points.shape[0]
    pad = (-P) % row_chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n = points.shape[0]
    n_chunks = n // row_chunk

    sq_norm = jnp.sum(points * points, axis=-1)  # [n]
    tol2 = jnp.float32(tolerance * tolerance)
    sentinel = jnp.int32(n)
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), sentinel)

    chunk_pts = points.reshape(n_chunks, row_chunk, 3)
    chunk_norm = sq_norm.reshape(n_chunks, row_chunk)
    chunk_valid = valid.reshape(n_chunks, row_chunk)

    def sweep(labels, _):
        def min_neighbor_label(args):
            pts_c, norm_c, valid_c = args
            d2 = (
                norm_c[:, None]
                + sq_norm[None, :]
                - 2.0
                * jnp.einsum(
                    "bi,ni->bn", pts_c, points, preferred_element_type=jnp.float32
                )
            )
            adj = (d2 <= tol2) & valid_c[:, None] & valid[None, :]
            return jnp.min(jnp.where(adj, labels[None, :], sentinel), axis=1)

        new = jax.lax.map(
            min_neighbor_label, (chunk_pts, chunk_norm, chunk_valid)
        ).reshape(n)
        new = jnp.minimum(labels, new)
        # pointer jumping: compress through the representative twice
        ext = jnp.append(new, sentinel)
        new = jnp.minimum(new, ext[jnp.minimum(new, n)])
        ext = jnp.append(new, sentinel)
        new = jnp.minimum(new, ext[jnp.minimum(new, n)])
        return new, None

    labels, _ = jax.lax.scan(sweep, labels0, None, length=iters)
    labels = labels[:P]
    return jnp.where(valid[:P], labels, jnp.int32(P))
