"""End-to-end pipeline tests on a synthetic scene (tiny map for CPU speed):
frame admission control, occupancy emergence over static structure, future
prediction, and the static-variant behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspmap_tpu import (
    dsp_dynamic,
    dsp_static,
    example_node_settings,
    init_state,
    make_step,
    get_occupancy_map,
    Frame,
)
from dspmap_tpu.utils import sim


def small_cfg(**kw):
    base = dict(
        nx=24, ny=24, nz=12,
        voxel_resolution=0.25,
        max_input_points=1024,
        mover_capacity=8192,
        pyramid_slot_capacity=96,
        max_clusters=16,
    )
    base.update(kw)
    return base


def run_frames(cfg, n_frames=8, seed=0, speed=0.5):
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    outs = []
    for pts, n, pos, quat, t in sim.generate_sequence(
        n_frames, cfg, seed=seed, speed=speed
    ):
        frame = Frame(
            points=jnp.asarray(pts),
            n_points=jnp.int32(n),
            sensor_pos=jnp.asarray(pos),
            quat=jnp.asarray(quat),
            timestamp=jnp.asarray(t),
        )
        state, out = step(state, frame)
        outs.append(out)
    return state, outs


@pytest.mark.parametrize(
    "preset", [dsp_dynamic, dsp_static], ids=["dynamic", "static"]
)
def test_pipeline_builds_occupancy(preset):
    cfg = example_node_settings(preset(**small_cfg()))
    state, outs = run_frames(cfg, n_frames=8)
    assert all(bool(o.accepted) for o in outs)
    alive = int(outs[-1].metrics["alive"])
    assert alive > 500, alive
    # occupancy must appear near true obstacle surfaces
    occ, centers, future, state = get_occupancy_map(state, cfg, threshold=0.2)
    occ = np.asarray(occ)
    assert occ.sum() > 10
    centers = np.asarray(centers)[occ]
    # every occupied voxel center should be near some scene surface: walls at
    # y=+-4, pillars, pedestrians, or ground (z <= ~0.3)
    near_ground = centers[:, 2] < 0.5
    near_wall = np.abs(np.abs(centers[:, 1] - 0.0) - 4.0) < 0.8
    plausible = near_ground | near_wall
    # pillars/pedestrians region
    plausible |= (centers[:, 0] > 2.0) & (centers[:, 0] < 9.0)
    assert plausible.mean() > 0.9, centers[~plausible][:20]
    # future accumulators cleared by readout
    assert float(jnp.sum(state.future)) == 0.0


def test_mover_payload_deferral_matches_direct(monkeypatch):
    """The huge-pool mover-payload deferral (ops/fov.py: pos/vel plane
    scatters merged into birth's scatter site, DS-classification corrected
    by [M]-sized scatter-adds) matches the direct path.  Production engages
    it at >= 64 MB planes; the threshold is lowered here to run it on the
    tiny CPU pool.  Tolerances: the classification correction re-associates
    float sums (~1e-7 relative); everything else is bit-exact."""
    from dspmap_tpu.ops import insert as insert_mod

    cfg = example_node_settings(dsp_dynamic(**small_cfg()))
    _, direct = run_frames(cfg, n_frames=6)
    monkeypatch.setattr(insert_mod, "_DEFER_PAYLOAD_BYTES", 0)
    _, deferred = run_frames(cfg, n_frames=6)
    for o_d, o_f in zip(direct, deferred):
        np.testing.assert_allclose(
            np.asarray(o_d.weight_sum), np.asarray(o_f.weight_sum),
            rtol=1e-5, atol=1e-6,
        )
        assert int(o_d.metrics["alive"]) == int(o_f.metrics["alive"])


def test_fov_bucket_switch_matches_full(monkeypatch):
    """The rebin candidate chain's prefix-bucket switch (ops/fov.py
    _rebin_chain) is bit-exact vs the full-capacity path: compaction packs
    candidates into a prefix, so a bucket that holds the realized count
    sees the identical candidate set."""
    from dspmap_tpu.ops import fov as fov_mod

    cfg = example_node_settings(
        dsp_dynamic(**small_cfg(fov_capacity=16384))
    )
    s_b, bucketed = run_frames(cfg, n_frames=5)
    monkeypatch.setattr(fov_mod, "_FOV_BUCKETS", False)
    s_f, full = run_frames(cfg, n_frames=5)
    for o_b, o_f in zip(bucketed, full):
        np.testing.assert_array_equal(
            np.asarray(o_b.weight_sum), np.asarray(o_f.weight_sum)
        )
        assert int(o_b.metrics["alive"]) == int(o_f.metrics["alive"])
        assert int(o_b.metrics["in_fov"]) == int(o_f.metrics["in_fov"])
    for a, b in zip(jax.tree.leaves(s_b.particles), jax.tree.leaves(s_f.particles)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frame_admission_control():
    cfg = example_node_settings(dsp_dynamic(**small_cfg()))
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    pts = jnp.zeros((cfg.max_input_points, 3), jnp.float32)
    good = Frame(pts, jnp.int32(0), jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]),
                 jnp.float32(0.0))
    state, out = step(state, good)
    assert bool(out.accepted)
    # bad quaternion
    bad_q = good._replace(quat=jnp.asarray([2.0, 0.0, 0.0, 0.0]),
                          timestamp=jnp.float32(0.1))
    state, out = step(state, bad_q)
    assert not bool(out.accepted)
    # ego jump > 10 m (dsp_dynamic.h:203-208)
    jump = good._replace(sensor_pos=jnp.asarray([50.0, 0.0, 0.0]),
                         timestamp=jnp.float32(0.2))
    state2, out = step(state, jump)
    assert not bool(out.accepted)
    # negative dt
    back = good._replace(timestamp=jnp.float32(-5.0))
    state3, out = step(state, back)
    assert not bool(out.accepted)
    # skipped frames leave the particle pool untouched
    np.testing.assert_array_equal(
        np.asarray(state2.particles.flags), np.asarray(state.particles.flags)
    )


def test_static_map_keeps_world_static_under_ego_motion():
    """With the static model, mapped structure must stay at the same world
    position while the robot moves (the reference achieves this by shifting
    all particles; we move the window instead)."""
    cfg = example_node_settings(dsp_static(**small_cfg()))
    scene = sim.Scene(
        boxes=[sim.Box(np.array([2.0, 1.0, 1.0]), np.array([0.5, 0.5, 2.0]),
                       np.zeros(3))]
    )
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    for pts, n, pos, quat, t in sim.generate_sequence(
        10, cfg, scene=scene, speed=0.8
    ):
        state, _ = step(state, Frame(jnp.asarray(pts), jnp.int32(n),
                                     jnp.asarray(pos), jnp.asarray(quat),
                                     jnp.asarray(t)))
    occ, centers, future, _ = get_occupancy_map(state, cfg, threshold=0.2)
    centers = np.asarray(centers)[np.asarray(occ)]
    assert len(centers) > 5
    # the pillar must be mapped at its world position (2.0, 1.0) even though
    # the robot has moved ~0.8 m
    above_ground = centers[centers[:, 2] > 0.5]
    assert len(above_ground) > 0
    near_pillar = (
        np.linalg.norm(above_ground[:, :2] - np.array([2.0, 1.0]), axis=1) < 0.7
    )
    assert near_pillar.mean() > 0.8, above_ground[:30]


def test_future_prediction_tracks_motion():
    """A fast obstacle's future occupancy at tau=2s should lead its current
    position along its velocity."""
    cfg = example_node_settings(dsp_dynamic(**small_cfg()))
    state, outs = run_frames(cfg, n_frames=8)
    occ, centers, future, _ = get_occupancy_map(state, cfg, threshold=0.2)
    future = np.asarray(future)
    assert future.shape == (cfg.voxel_num, cfg.n_horizons)
    assert future.sum() > 0.0


def test_runtime_setters_no_recompile():
    """The reference's live setters (dsp_dynamic.h:355-382) must work
    between frames without re-jitting: RuntimeParams scalars are traced, so
    flipping sigma_ob / P_d / newborn weight reuses the compiled step."""
    from dspmap_tpu import (
        set_observation_stddev,
        set_prediction_variance,
        set_newborn_particle_weight,
    )

    cfg = example_node_settings(dsp_dynamic(**small_cfg()))
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    frames = [
        Frame(jnp.asarray(pts), jnp.int32(n), jnp.asarray(pos),
              jnp.asarray(quat), jnp.asarray(t))
        for pts, n, pos, quat, t in sim.generate_sequence(4, cfg, seed=3)
    ]
    state, _ = step(state, frames[0])
    state, _ = step(state, frames[1])
    n_compiles = step._cache_size()

    # flip every live knob; the compiled step must be reused
    state_hi = set_observation_stddev(state, 1.0)
    state_hi = set_prediction_variance(state_hi, 0.3, 0.3)
    state_hi = set_newborn_particle_weight(state_hi, 0.01)
    out_hi_state, out_hi = step(state_hi, frames[2])
    assert step._cache_size() == n_compiles, "setter caused a re-jit"

    # and the knobs must actually change behavior: a 10x sigma_ob spreads
    # the observation kernel -> different weight field than the untouched
    # state stepped over the same frame
    out_lo_state, out_lo = step(state, frames[2])
    assert bool(out_hi.accepted) and bool(out_lo.accepted)
    w_hi = np.asarray(out_hi_state.weight_sum)
    w_lo = np.asarray(out_lo_state.weight_sum)
    assert not np.allclose(w_hi, w_lo)


@pytest.mark.parametrize(
    "preset", [dsp_dynamic, dsp_static], ids=["limit_xy", "static"]
)
def test_velocity_clamp_invariant_holds(preset):
    """The write-site velocity-clamp invariant (models/pipeline.py;
    dsp_dynamic.h:661-663 / dsp_static.h:640-646): after random init,
    births, mover re-insertion and resampling, every VALID particle's
    clamped velocity components are exactly zero -- the pipeline relies on
    this instead of re-clamping the whole pool each frame, and the Pallas
    occupancy kernel elides the clamped planes from its I/O entirely."""
    import dspmap_tpu as dm

    cfg = preset(**small_cfg())
    assert cfg.limit_motion_to_xy_plane or cfg.motion_model == "static"
    state = init_state(cfg, jax.random.key(0))
    # the one write site that draws non-conforming velocities
    state = dm.add_random_particles(state, cfg, 500, 0.01)
    step = jax.jit(make_step(cfg))
    for pts, n, pos, quat, t in sim.generate_sequence(6, cfg, seed=11):
        state, out = step(state, Frame(
            points=jnp.asarray(pts), n_points=jnp.int32(n),
            sensor_pos=jnp.asarray(pos), quat=jnp.asarray(quat),
            timestamp=jnp.asarray(t)))
    p = state.particles
    clamped = ("vx", "vy", "vz") if cfg.motion_model == "static" else ("vz",)
    for name in clamped:
        v = np.asarray(jnp.where(p.valid, getattr(p, name), 0.0))
        assert np.abs(v).max() == 0.0, name
    assert int(out.metrics["alive"]) > 0
