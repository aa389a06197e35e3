"""Sharded compact layout: GSPMD equivalence, shard_map behavioral band,
ownership invariant, ring exchange (8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dspmap_tpu as dm
from dspmap_tpu.parallel import (
    make_mesh, make_sharded_step, make_shardmap_step, shard_state,
)
from dspmap_tpu.utils import sim


def cfg_compact(**kw):
    base = dict(
        nx=24, ny=24, nz=12, voxel_resolution=0.25, max_input_points=1024,
        mover_capacity=8192, pyramid_slot_capacity=96, max_clusters=16,
        layout="compact", particle_capacity=16384,
    )
    base.update(kw)
    return dm.example_node_settings(dm.dsp_dynamic(**base))


def _frames(cfg, n, seed=0, speed=0.5):
    return [
        dm.Frame(jnp.asarray(p), jnp.int32(c), jnp.asarray(pos),
                 jnp.asarray(q), jnp.asarray(t))
        for p, c, pos, q, t in sim.generate_sequence(n, cfg, seed=seed,
                                                     speed=speed)
    ]


def _run(step, state, frames):
    for f in frames:
        state, out = step(state, f)
    return state, out


def test_gspmd_compact_matches_single_device():
    cfg = cfg_compact()
    frames = _frames(cfg, 5)
    s0, o0 = _run(jax.jit(dm.make_step(cfg)), dm.init_state(cfg, jax.random.key(0)), frames)
    mesh = make_mesh(4)
    s1, o1 = _run(
        make_sharded_step(cfg, mesh),
        shard_state(dm.init_state(cfg, jax.random.key(0)), mesh), frames,
    )
    assert int(o0.metrics["alive"]) == int(o1.metrics["alive"])
    np.testing.assert_allclose(
        np.asarray(o0.weight_sum), np.asarray(o1.weight_sum),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("exchange", ["all_gather", "ring"])
def test_shardmap_compact_behavioral_band(exchange):
    """The hand-scheduled path deviates only by arrival order / FOV
    candidate order: aggregate weight and population stay within a tight
    band of the single-device run, and the ownership invariant holds."""
    cfg = cfg_compact(mover_exchange=exchange)
    frames = _frames(cfg, 6)
    s0, o0 = _run(jax.jit(dm.make_step(cfg)), dm.init_state(cfg, jax.random.key(0)), frames)
    mesh = make_mesh(4)
    s1, o1 = _run(
        make_shardmap_step(cfg, mesh),
        shard_state(dm.init_state(cfg, jax.random.key(0)), mesh), frames,
    )
    a0, a1 = int(o0.metrics["alive"]), int(o1.metrics["alive"])
    w0 = float(jnp.sum(o0.weight_sum))
    w1 = float(jnp.sum(o1.weight_sum))
    assert abs(a0 - a1) <= max(10, 0.05 * a0), (a0, a1)
    assert abs(w0 - w1) <= max(0.5, 0.05 * w0), (w0, w1)

    # ownership invariant: every live row's cell lies in its shard's slab
    from dspmap_tpu import geometry

    P = cfg.compact_capacity
    n = mesh.devices.size
    p_loc = P // n
    v_loc = cfg.storage_voxels // n
    flags = np.asarray(s1.particles.flags)
    pos = np.stack([np.asarray(s1.particles.px), np.asarray(s1.particles.py),
                    np.asarray(s1.particles.pz)], -1)
    wv = np.floor(pos / cfg.voxel_resolution).astype(np.int64)
    cells = (
        (wv[:, 2] % cfg.nz) * cfg.ny + wv[:, 1] % cfg.ny
    ) * cfg.nx + wv[:, 0] % cfg.nx
    for sh in range(n):
        rows = slice(sh * p_loc, (sh + 1) * p_loc)
        live = flags[rows] != 0
        if live.any():
            c = cells[rows][live]
            assert (c // v_loc == sh).all(), sh


def test_shardmap_compact_multi_neighbor_variant():
    """Verdict item 4: the multi-neighbor variant under shard_map (compact
    layout; 1-degree pyramids with a 25-cell neighborhood)."""
    cfg = dm.example_node_settings(dm.dsp_dynamic_multi_neighbors(
        nx=24, ny=24, nz=12, voxel_resolution=0.25, max_input_points=512,
        mover_capacity=4096, pyramid_slot_capacity=64, max_clusters=8,
        layout="compact", particle_capacity=16384,
    ))
    frames = _frames(cfg, 4)
    mesh = make_mesh(4)
    s1, o1 = _run(
        make_shardmap_step(cfg, mesh),
        shard_state(dm.init_state(cfg, jax.random.key(0)), mesh), frames,
    )
    assert bool(o1.accepted)
    assert int(o1.metrics["alive"]) > 0
