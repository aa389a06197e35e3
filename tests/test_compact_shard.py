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


def test_ring_exchange_kills_beyond_hops_movers():
    """Round-4 verdict item 4: a mover whose destination slab is further
    than ring_hops must be KILLED AND COUNTED by the ring exchange (the
    all_gather path must deliver the same mover).  Self-motion is the only
    cross-slab traffic in the toroidal design (ego motion moves the window,
    not the cells), so the violating regime is a particle velocity crossing
    several z-slabs in one frame."""
    import dataclasses

    n = 4
    cfg = dm.example_node_settings(dm.dsp_dynamic(
        nx=16, ny=16, nz=16, voxel_resolution=0.25, max_input_points=256,
        mover_capacity=1024, pyramid_slot_capacity=32, max_clusters=8,
        layout="compact", particle_capacity=4096,
        limit_motion_to_xy_plane=False,  # need vertical motion
        mover_exchange="ring", ring_hops=1,
        estimator_enabled=False,
    ))
    mesh = make_mesh(n)
    P = cfg.compact_capacity
    p_loc = P // n

    from dspmap_tpu import geometry

    frames = _frames(cfg, 2, speed=0.0)
    pos0 = np.asarray(frames[0].sensor_pos)
    origin = np.asarray(geometry.window_origin(
        jnp.asarray(pos0), cfg
    ))
    # find a window z whose storage z-row sits in slab 0 and whose +8-row
    # destination stays inside the window (slab = z_row // 4 exactly: each
    # z-row is 256 cells and v_local = 1024)
    rel_z = next(
        r for r in range(8) if ((origin[2] + r) % cfg.nz) // 4 == 0
    )
    src_row_block = 0  # slab 0 owns rows [0, p_loc)
    z0 = (origin[2] + rel_z + 0.5) * cfg.voxel_resolution

    def seeded_state(exchange):
        c = dataclasses.replace(cfg, mover_exchange=exchange)
        state = dm.init_state(c, jax.random.key(0))
        p = state.particles
        flags = np.asarray(p.flags).copy()
        px = np.asarray(p.px).copy(); py = np.asarray(p.py).copy()
        pz = np.asarray(p.pz).copy(); vz = np.asarray(p.vz).copy()
        w = np.asarray(p.weight).copy()
        i = src_row_block
        flags[i] = 1
        px[i] = (origin[0] + 8.5) * cfg.voxel_resolution
        py[i] = (origin[1] + 8.5) * cfg.voxel_resolution
        pz[i] = z0
        vz[i] = 8 * cfg.voxel_resolution / 0.1  # +8 z-rows per 0.1 s frame
        w[i] = 5.0
        particles = dataclasses.replace(
            p, flags=jnp.asarray(flags), px=jnp.asarray(px),
            py=jnp.asarray(py), pz=jnp.asarray(pz), vz=jnp.asarray(vz),
            weight=jnp.asarray(w),
        )
        return dataclasses.replace(state, particles=particles), c

    results = {}
    for exchange in ("ring", "all_gather"):
        state, c = seeded_state(exchange)
        step = make_shardmap_step(c, mesh)
        state = shard_state(state, mesh)
        # frame 1 initializes (dt = 0, nothing moves); frame 2 advances
        state, out = step(state, frames[0])
        state, out = step(state, frames[1])
        results[exchange] = {
            "killed": int(out.metrics["mover_overflow_killed"]),
            "alive": int(out.metrics["alive"]),
        }
    # ring: the 2-slab mover is undeliverable -> killed and counted
    assert results["ring"]["killed"] >= 1, results
    # all_gather: same mover is delivered (no overflow kill from distance)
    assert results["all_gather"]["killed"] == 0, results
    # and the ring run holds one fewer live particle than the all_gather run
    assert results["all_gather"]["alive"] == results["ring"]["alive"] + 1, \
        results
