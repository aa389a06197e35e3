"""Velocity-estimator stack: clustering vs a BFS oracle, auction assignment
vs brute-force optimum, and end-to-end velocity recovery on two frames."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from dspmap_tpu import dsp_dynamic
from dspmap_tpu.state import init_estimator_state
from dspmap_tpu.ops.cluster import euclidean_cluster
from dspmap_tpu.ops.assignment import solve_assignment as auction_assignment
from dspmap_tpu.estimator import estimate_velocities


def _bfs_components(pts, valid, tol):
    n = len(pts)
    labels = -np.ones(n, int)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    adj = (d2 <= tol * tol) & valid[:, None] & valid[None, :]
    for i in range(n):
        if not valid[i] or labels[i] >= 0:
            continue
        stack, comp = [i], []
        labels[i] = i
        while stack:
            j = stack.pop()
            comp.append(j)
            for k in np.nonzero(adj[j])[0]:
                if labels[k] < 0:
                    labels[k] = i
                    stack.append(k)
        root = min(comp)
        for j in comp:
            labels[j] = root
    return labels


def test_clustering_matches_bfs_oracle():
    rng = np.random.default_rng(0)
    # several blobs + scattered noise
    blobs = [
        rng.normal(c, 0.08, (rng.integers(5, 40), 3))
        for c in [(0, 0, 1), (2, 1, 1), (-1.5, 2, 0.5), (4, -2, 1.2)]
    ]
    noise = rng.uniform(-5, 5, (30, 3))
    pts = np.concatenate(blobs + [noise]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    valid[rng.choice(len(pts), 10, replace=False)] = False

    got = np.asarray(
        euclidean_cluster(jnp.asarray(pts), jnp.asarray(valid), 0.3, iters=16)
    )
    oracle = _bfs_components(pts.astype(np.float64), valid, 0.3)
    # same partition: equal label pairs agree
    for i, j in itertools.combinations(range(0, len(pts), 3), 2):
        if valid[i] and valid[j]:
            assert (got[i] == got[j]) == (oracle[i] == oracle[j]), (i, j)
    assert (got[~valid] == len(pts)).all()


def _brute_force_assignment(cost, rows, cols):
    """Optimal assignment by exhaustive search (small instances)."""
    rows = np.nonzero(rows)[0]
    cols = np.nonzero(cols)[0]
    k = min(len(rows), len(cols))
    best, best_assign = np.inf, {}
    for rsub in itertools.permutations(rows, k):
        for csub in itertools.combinations(cols, k):
            tot = sum(cost[r, c] for r, c in zip(rsub, csub))
            if tot < best - 1e-9:
                best, best_assign = tot, dict(zip(rsub, csub))
    return best, best_assign


def test_auction_matches_bruteforce_optimum():
    rng = np.random.default_rng(1)
    for trial in range(8):
        nr, nc = rng.integers(1, 6), rng.integers(1, 6)
        R = 8
        cost = rng.uniform(0, 1000, (R, R)).astype(np.float32)
        rows = np.zeros(R, bool); rows[:nr] = True
        cols = np.zeros(R, bool); cols[:nc] = True
        got = np.asarray(
            auction_assignment(jnp.asarray(cost), jnp.asarray(rows), jnp.asarray(cols))
        )
        best, _ = _brute_force_assignment(cost.astype(np.float64), rows, cols)
        got_cost = sum(cost[r, got[r]] for r in range(R) if rows[r] and got[r] >= 0)
        n_assigned = sum(1 for r in range(R) if rows[r] and got[r] >= 0)
        assert n_assigned == min(nr, nc), (trial, got)
        # within auction eps-optimality of the brute-force optimum
        assert got_cost <= best + 5.0, (trial, got_cost, best)


def test_estimator_recovers_cluster_velocity():
    cfg = dsp_dynamic(max_input_points=512, max_clusters=8,
                      voxel_filter_resolution=0.1)
    rng = np.random.default_rng(2)
    P = cfg.max_input_points

    def make_cloud(center):
        blob = rng.normal(center, 0.05, (40, 3))
        ground = np.column_stack(
            [rng.uniform(-3, 3, 60), rng.uniform(-3, 3, 60), np.zeros(60)]
        )
        pts = np.zeros((P, 3), np.float32)
        cloud = np.concatenate([blob, ground])
        pts[: len(cloud)] = cloud
        valid = np.zeros(P, bool)
        valid[: len(cloud)] = True
        return jnp.asarray(pts), jnp.asarray(valid)

    est_state = init_estimator_state(cfg)
    key = jax.random.key(0)
    # frame 1: cluster at (1, 0, 1)
    c1, v1 = make_cloud((1.0, 0.0, 1.0))
    out1, est_state = estimate_velocities(c1, v1, est_state, cfg, jnp.float32(0.1), key)
    # unmatched dynamic cluster: sentinel velocity
    dyn1 = np.asarray(out1.dynamic)
    assert dyn1.sum() >= 30
    assert (np.asarray(out1.vel)[dyn1] < -100).all()
    # ground points are valid, static, v=0
    gnd = np.asarray(v1) & ~dyn1
    assert np.asarray(out1.valid)[gnd].all()
    np.testing.assert_array_equal(np.asarray(out1.vel)[gnd], 0.0)

    # frame 2: cluster moved by (0.05, 0.1, 0) in dt=0.1 -> v=(0.5, 1.0, 0)
    c2, v2 = make_cloud((1.05, 0.1, 1.0))
    out2, est_state = estimate_velocities(c2, v2, est_state, cfg, jnp.float32(0.1), key)
    dyn2 = np.asarray(out2.dynamic)
    vels = np.asarray(out2.vel)[dyn2]
    assert len(vels) >= 30
    np.testing.assert_allclose(vels[:, 0], 0.5, atol=0.25)
    np.testing.assert_allclose(vels[:, 1], 1.0, atol=0.25)


def test_estimator_rejects_fast_clusters():
    cfg = dsp_dynamic(max_input_points=256, max_clusters=8,
                      voxel_filter_resolution=0.1)
    rng = np.random.default_rng(3)
    P = cfg.max_input_points

    def cloud(center):
        blob = rng.normal(center, 0.05, (30, 3)).astype(np.float32)
        pts = np.zeros((P, 3), np.float32); pts[:30] = blob
        valid = np.zeros(P, bool); valid[:30] = True
        return jnp.asarray(pts), jnp.asarray(valid)

    est_state = init_estimator_state(cfg)
    key = jax.random.key(1)
    c1, v1 = cloud((0.0, 0.0, 1.0))
    _, est_state = estimate_velocities(c1, v1, est_state, cfg, jnp.float32(0.1), key)
    # moves 1.0 m in 0.1 s = 10 m/s > 5 m/s cap... but also beyond the 1.5 m
    # association gate? no: 1.0 < 1.5 -> matched, then speed-capped to 0
    c2, v2 = cloud((1.0, 0.0, 1.0))
    out, _ = estimate_velocities(c2, v2, est_state, cfg, jnp.float32(0.1), key)
    dyn = np.asarray(out.dynamic)
    vels = np.asarray(out.vel)[dyn]
    # matched (not sentinel) but zeroed (dsp_dynamic.h:1490-1493)
    np.testing.assert_array_equal(vels, 0.0)
