"""Property-based invariants (hypothesis): mass conservation and capacity
semantics of the stochastic-population machinery under random inputs."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from dspmap_tpu import dsp_dynamic, init_state
from dspmap_tpu import geometry
from dspmap_tpu.ops.common import compact_mask, compact_and_group
from dspmap_tpu.ops.insert import insert_particles
from dspmap_tpu.ops.occupancy import occupancy_and_resample


def tiny():
    return dsp_dynamic(
        nx=8, ny=8, nz=4, voxel_resolution=0.25,
        max_input_points=64, mover_capacity=512,
        pyramid_slot_capacity=16, max_clusters=4,
        newborn_particles_per_point=4,
    )


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.floats(0.01, 0.9))
def test_compact_mask_is_exact_nonzero(seed, density):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 5000))
    cap = int(rng.integers(4, n + 4))
    mask = rng.random(n) < density
    idx, valid, n_kept, n_over = compact_mask(jnp.asarray(mask), cap)
    expect = np.nonzero(mask)[0]
    k = int(n_kept)
    assert k == min(len(expect), cap)
    assert int(n_over) == len(expect) - k
    np.testing.assert_array_equal(np.asarray(idx)[:k], expect[:k])
    assert not np.asarray(valid)[k:].any()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_compact_and_group_orders_stably(seed):
    rng = np.random.default_rng(seed)
    n, groups = 2000, 13
    mask = rng.random(n) < 0.3
    gid = rng.integers(0, groups, n)
    idx, g, ranks, valid, n_sel = compact_and_group(
        jnp.asarray(mask), jnp.asarray(gid, np.int32), 1024, groups
    )
    idx, g, ranks, valid = map(np.asarray, (idx, g, ranks, valid))
    sel = valid
    # groups ascending; stable (original index ascending) within groups
    assert (np.diff(g[sel]) >= 0).all()
    for grp in range(groups):
        members = idx[sel & (g == grp)]
        expect = np.nonzero(mask & (gid == grp))[0][: len(members)]
        np.testing.assert_array_equal(members, expect)
        np.testing.assert_array_equal(
            ranks[sel & (g == grp)], np.arange(len(members))
        )


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_insert_capacity_and_payload_integrity(seed):
    cfg = tiny()
    rng = np.random.default_rng(seed)
    state = init_state(cfg, jax.random.key(seed % 1000))
    m = int(rng.integers(1, 400))
    half = np.asarray(cfg.half_extent) * 0.95
    pos = rng.uniform(-half, half, (m, 3)).astype(np.float32)
    w = rng.uniform(0.01, 1.0, m).astype(np.float32)
    p = insert_particles(
        state.particles, cfg,
        pos=jnp.asarray(pos), vel=jnp.zeros((m, 3)), weight=jnp.asarray(w),
        valid=jnp.ones((m,), bool), origin=state.origin,
        flag=jnp.int32(3), t=0.0,
    )
    S = cfg.slots_per_voxel
    # per-voxel occupancy never exceeds capacity; kept payloads intact
    per_vox = np.asarray(p.valid).sum(axis=0)
    assert per_vox.max(initial=0) <= S
    # each voxel holds min(arrivals, S) particles
    cells = np.asarray(geometry.storage_index(
        geometry.world_voxel(jnp.asarray(pos), cfg), cfg))
    for c in np.unique(cells):
        assert per_vox[c] == min((cells == c).sum(), S)
    # total inserted weight = sum of the first-S arrivals per voxel
    expect_w = 0.0
    for c in np.unique(cells):
        expect_w += w[cells == c][:S].sum()
    np.testing.assert_allclose(
        float(jnp.sum(p.weight * p.valid)), expect_w, rtol=1e-5
    )


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_resample_conserves_mass_in_resampled_voxels(seed):
    cfg = tiny()
    rng = np.random.default_rng(seed)
    state = init_state(cfg, jax.random.key(0))
    # planes are storage_voxels wide (1024-padded); the pad columns past
    # voxel_num are dead storage and must stay empty
    S, V = cfg.slots_per_voxel, cfg.storage_voxels
    flags = (rng.random((S, V)) < 0.4).astype(np.int32)
    flags[:, cfg.voxel_num:] = 0
    weights = np.where(flags > 0, rng.uniform(2e-3, 1.0, (S, V)), 0.0).astype(
        np.float32
    )
    wv_all = np.asarray(geometry.storage_to_world_voxel(state.origin, cfg))
    centers = np.zeros((V, 3), np.float32)
    centers[: cfg.voxel_num] = (wv_all + 0.5) * cfg.voxel_resolution
    p = dataclasses.replace(
        state.particles,
        flags=jnp.asarray(flags), weight=jnp.asarray(weights),
        px=jnp.broadcast_to(jnp.asarray(centers[:, 0]), (S, V)),
        py=jnp.broadcast_to(jnp.asarray(centers[:, 1]), (S, V)),
        pz=jnp.broadcast_to(jnp.asarray(centers[:, 2]), (S, V)),
    )
    new_p, wsum, vel_avg, future, stats = occupancy_and_resample(
        p, cfg, state.origin, state.future
    )
    new_w = np.asarray(new_p.weight * new_p.valid)
    counts = flags.sum(axis=0)
    # mass conservation per voxel (weights above cull threshold everywhere)
    np.testing.assert_allclose(
        new_w.sum(axis=0), weights.sum(axis=0), rtol=2e-3, atol=1e-5
    )
    # post-resample population bounded by the target
    resampled = counts >= cfg.resample_min_count
    assert (
        np.asarray(new_p.valid).sum(axis=0)[resampled]
        <= cfg.max_particles_per_voxel
    ).all()
