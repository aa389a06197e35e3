"""Euclidean clustering as fixed-iteration label propagation.

The reference clusters non-ground points with a PCL KdTree +
``EuclideanClusterExtraction`` (``include/dsp_dynamic.h:1406-1417``): connected
components of the graph linking points within the cluster tolerance.  A KdTree
is a pointer-chasing structure with data-dependent shapes -- hostile to XLA --
so we compute the same components by iterated min-label propagation over the
pairwise-distance graph with pointer jumping (label doubling): each sweep a
point adopts the smallest label among its tolerance neighbors, then labels are
compressed through themselves twice, giving exponential reach per sweep.  The
adjacency matrix is position-only, so it is materialized ONCE (d^2 through the
Gram identity on the MXU; ~26 MB bool at the reference's 5000-point budget,
``map_sim_example.cpp:48``) and every sweep is a single masked min-reduce over
it -- measured 2.5x faster than recomputing distances per sweep inside a
``lax.scan`` (the sequential-while dispatch overhead dominated, docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def euclidean_cluster(
    points: jnp.ndarray,  # [P, 3]
    valid: jnp.ndarray,  # [P] bool
    tolerance: float,
    iters: int = 16,
    row_chunk: int = 1024,  # kept for API compatibility; unused
) -> jnp.ndarray:
    """Connected components under ``dist <= tolerance``.

    Returns ``labels[P]``: the index of each point's component representative
    (the smallest member index); invalid points get the sentinel ``P``.
    Equivalent to PCL euclidean cluster extraction before size filtering
    (dsp_dynamic.h:1406-1417).
    """
    P = points.shape[0]
    pad = (-P) % 128
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n = points.shape[0]

    # Prefix-bucket specialization: every sweep touches the FULL [n, n]
    # adjacency (26 MB at the 5000-point budget) while realized valid
    # counts sit far below capacity (street scenes: ~1.8-2.5k non-ground
    # of 5120).  Compaction is order-preserving, so the component
    # representative (smallest member index) of the compacted problem maps
    # back to the smallest ORIGINAL index -- labels are exactly preserved
    # under compact -> cluster -> scatter-back.  A lax.switch picks the
    # smallest half-capacity bucket holding the realized count; adjacency
    # and sweep cost shrink quadratically with the bucket.  (An earlier
    # FIXED 2048 budget with a cond fallback was a measured regression --
    # the fallback doubled the traced program around the estimator cond;
    # the switch variants here share one traced site.  docs/PERF.md.)
    sizes = [n]
    while sizes[0] > 1280 and sizes[0] % 2 == 0:
        sizes.insert(0, sizes[0] // 2)
    if len(sizes) > 1:
        from .common import compact_mask

        c_idx, c_valid, n_live, _ = compact_mask(valid, n)

        def mk(sz):
            def branch(_):
                pts = points[c_idx[:sz]]
                lab_c = _propagate(pts, c_valid[:sz], tolerance, iters)
                # map compacted roots back to original indices; invalid
                # compacted lanes carry the local sentinel sz
                root = c_idx[jnp.minimum(lab_c, sz - 1)]
                tgt = jnp.where(c_valid[:sz] & (lab_c < sz), c_idx[:sz], n)
                return (
                    jnp.full((n,), n, jnp.int32)
                    .at[tgt]
                    .set(root, mode="drop", unique_indices=True)
                )
            return branch

        case = jnp.searchsorted(jnp.asarray(sizes, jnp.int32), n_live)
        labels = jax.lax.switch(case, [mk(s) for s in sizes],
                                jnp.int32(0))
    else:
        labels = _propagate(points, valid, tolerance, iters)

    labels = labels[:P]
    return jnp.where(valid[:P], labels, jnp.int32(P))


def _propagate(points: jnp.ndarray, valid: jnp.ndarray, tolerance,
               iters: int) -> jnp.ndarray:
    """Min-label propagation core over a [n, 3] point set; returns [n]
    labels with sentinel ``n`` for invalid points."""
    n = points.shape[0]
    sq_norm = jnp.sum(points * points, axis=-1)  # [n]
    tol2 = jnp.float32(tolerance * tolerance)
    sentinel = jnp.int32(n)
    iota = jnp.arange(n, dtype=jnp.int32)

    labels = jnp.where(valid, iota, sentinel)
    # (A tolerance-cell seeding pass -- same-cell points share their min
    # index before the first sweep -- was measured a net LOSS: the while
    # loop ran the same 3-5 sweeps regardless (label doubling already has
    # exponential reach) and the seeding sort/scatter added ~1 ms of fused
    # overhead around the estimator cond.  docs/PERF.md round-2 log.)

    d2 = (
        sq_norm[:, None]
        + sq_norm[None, :]
        - 2.0
        * jnp.einsum("bi,ni->bn", points, points,
                     preferred_element_type=jnp.float32)
    )
    adj = (d2 <= tol2) & valid[:, None] & valid[None, :]  # [n, n], once
    # (A u32-bitpacked adjacency with a 32-step in-register unpack was
    # measured SLOWER (1.25 vs 1.03 ms/frame): the sweep is VPU-bound on
    # the 26M select+min lanes, not HBM-bound, and the bit chain serializes.)

    def sweep(labels):
        new = jnp.min(jnp.where(adj, labels[None, :], sentinel), axis=1)
        new = jnp.minimum(labels, new)
        # pointer jumping: compress through the representative once
        ext = jnp.append(new, sentinel)
        return jnp.minimum(new, ext[jnp.minimum(new, n)])

    # Early exit on convergence: street scenes settle in ~3-5 sweeps while
    # the worst case (a tolerance-spaced chain) needs the full budget; each
    # sweep reads the whole adjacency (~26 MB at the 5000-point budget), so
    # the while_loop's ~us-scale dispatch overhead is a clear trade
    # (docs/PERF.md).  Fixed-point termination equals the fixed-iteration
    # result: sweeps are monotone and idempotent at convergence.
    def cond(st):
        i, labels, changed = st
        return (i < iters) & changed

    def body(st):
        i, labels, _ = st
        new = sweep(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(True))
    )
    return labels
