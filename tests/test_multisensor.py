"""Multi-sensor fusion: two cameras looking at disjoint halves of a scene
must jointly map structure neither sees alone; a bad camera is skipped per
sensor (not per frame); the sequential-PHD composition obeys its mass
inequality under empty sensors."""

import numpy as np
import jax
import jax.numpy as jnp

from dspmap_tpu import dsp_dynamic, example_node_settings, get_occupancy_map, Frame
from dspmap_tpu.models.pipeline import make_multisensor_step, init_multisensor_state
from dspmap_tpu.utils import sim


def _small_cfg():
    return example_node_settings(dsp_dynamic(
        nx=24, ny=24, nz=12, voxel_resolution=0.25,
        max_input_points=512, mover_capacity=4096,
        pyramid_slot_capacity=64, max_clusters=8,
    ))


def _street_frames(cfg, n_frames, splitter=None, seed=0):
    """Two-sensor frame stream from the street scene: both sensors share the
    pose; ``splitter(points, n) -> ((pA, nA), (pB, nB))`` divides the cloud
    (default: both get everything)."""
    out = []
    for pts, n, pos, quat, t in sim.generate_sequence(n_frames, cfg, seed=seed):
        if splitter is None:
            (pa, na), (pb, nb) = (pts, n), (pts, n)
        else:
            (pa, na), (pb, nb) = splitter(pts, n)
        out.append(Frame(
            points=jnp.asarray(np.stack([pa, pb])),
            n_points=jnp.asarray([na, nb], jnp.int32),
            sensor_pos=jnp.asarray(np.stack([pos, pos])),
            quat=jnp.asarray(np.stack([quat, quat])),
            timestamp=jnp.asarray([t, t]),
        ))
    return out


def test_bad_sensor_quaternion_skipped_per_sensor():
    """A NaN/zero quaternion on sensor 1 must not reject the frame or poison
    the map: the frame stays accepted, the result is finite, is independent
    of WHICH garbage the quaternion holds, and equals more than sensor 0
    alone would... strictly: differs from the all-good run (sensor 1 really
    is gated out)."""
    cfg = _small_cfg()
    step = jax.jit(make_multisensor_step(cfg, 2))

    def run(poison):
        state = init_multisensor_state(cfg, 2, jax.random.key(0))
        for f in _street_frames(cfg, 4):
            if poison is not None:
                q = np.asarray(f.quat).copy()
                q[1] = poison
                f = f._replace(quat=jnp.asarray(q))
            state, out = step(state, f)
            assert bool(out.accepted)
        return np.asarray(state.weight_sum)

    # invalid per the reference's own gate (any |component| > 1.001,
    # dsp_dynamic.h:193-196); NaN fails the same comparison
    w_nan = run(np.full(4, np.nan, np.float32))
    w_big = run(np.full(4, 7.0, np.float32))
    w_good = run(None)
    assert np.isfinite(w_nan).all()
    np.testing.assert_array_equal(w_nan, w_big)  # gate is value-independent
    assert not np.array_equal(w_nan, w_good)  # sensor 1 really contributes
    assert w_nan.sum() > 0  # sensor 0 alone still built a map


def test_complementary_idle_sensor_is_identity():
    """Behavioral property of the sequential-PHD composition: a second
    sensor whose FOV contains no particles and whose cloud is empty
    contributes a strictly identity measurement stage -- the two-sensor map
    must equal the one-sensor map EXACTLY (the per-sensor key schedule keeps
    sensor 0's draws identical across the two configurations; the reference
    has no multi-sensor analogue, SURVEY.md section 2.6 -- cite of
    absence)."""
    cfg = _small_cfg()
    step1 = jax.jit(make_multisensor_step(cfg, 1))
    step2 = jax.jit(make_multisensor_step(cfg, 2))
    q_bwd = np.array([0.0, 0.0, 0.0, 1.0], np.float32)  # yaw 180 deg

    s1 = init_multisensor_state(cfg, 1, jax.random.key(0))
    s2 = init_multisensor_state(cfg, 2, jax.random.key(0))
    for pts, n, pos, quat, t in sim.generate_sequence(5, cfg, seed=0):
        f1 = Frame(
            points=jnp.asarray(pts)[None], n_points=jnp.asarray([n], jnp.int32),
            sensor_pos=jnp.asarray(pos)[None], quat=jnp.asarray(quat)[None],
            timestamp=jnp.asarray([t]),
        )
        f2 = Frame(
            points=jnp.asarray(np.stack([pts, np.zeros_like(pts)])),
            n_points=jnp.asarray([n, 0], jnp.int32),
            sensor_pos=jnp.asarray(np.stack([pos, pos])),
            quat=jnp.asarray(np.stack([quat, q_bwd])),
            timestamp=jnp.asarray([t, t]),
        )
        s1, o1 = step1(s1, f1)
        s2, o2 = step2(s2, f2)
        assert bool(o1.accepted) and bool(o2.accepted)

    w1, w2 = np.asarray(s1.weight_sum), np.asarray(s2.weight_sum)
    assert w1.sum() > 0  # non-vacuous
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(
        np.asarray(s1.particles.weight), np.asarray(s2.particles.weight)
    )


def test_empty_sensors_never_increase_mass():
    """Oracle-free property of the sequential-PHD stage: a sensor with zero
    observations can only downweight (miss-penalty (1 - P_d) inside FOV) and
    never births, so total map mass is non-increasing over all-empty
    frames."""
    cfg = _small_cfg()
    step = jax.jit(make_multisensor_step(cfg, 2))
    state = init_multisensor_state(cfg, 2, jax.random.key(0))
    frames = _street_frames(cfg, 8)
    for f in frames[:4]:  # build up a population first
        state, _ = step(state, f)
    mass = float(np.asarray(state.weight_sum).sum())
    assert mass > 0
    for f in frames[4:]:
        empty = f._replace(n_points=jnp.zeros_like(f.n_points))
        state, out = step(state, empty)
        new_mass = float(np.asarray(state.weight_sum).sum())
        assert new_mass <= mass * (1.0 + 1e-5), (new_mass, mass)
        mass = new_mass


def test_two_sensor_fusion_covers_both_halves():
    cfg = example_node_settings(dsp_dynamic(
        nx=24, ny=24, nz=12, voxel_resolution=0.25,
        max_input_points=512, mover_capacity=4096,
        pyramid_slot_capacity=64, max_clusters=8,
    ))
    # two pillars: one ahead (+x), one behind (-x) of the shared position
    scene_fwd = sim.Scene(boxes=[
        sim.Box(np.array([2.0, 0.5, 1.0]), np.array([0.5, 0.5, 2.0]), np.zeros(3))],
        ground_extent=4.0)
    scene_bwd = sim.Scene(boxes=[
        sim.Box(np.array([-2.0, -0.5, 1.0]), np.array([0.5, 0.5, 2.0]), np.zeros(3))],
        ground_extent=4.0)

    n_sensors = 2
    state = init_multisensor_state(cfg, n_sensors, jax.random.key(0))
    step = jax.jit(make_multisensor_step(cfg, n_sensors))
    rng = np.random.default_rng(0)
    pos = np.array([0.0, 0.0, 1.0], np.float32)
    q_fwd = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    q_bwd = np.array([0.0, 0.0, 0.0, 1.0], np.float32)  # yaw 180 deg

    for i in range(6):
        t = np.float32(0.1 * i)
        p1, n1 = sim.render_frame(scene_fwd, pos, q_fwd, float(t), rng,
                                  cfg.max_input_points, points_per_box=150,
                                  ground_points=200,
                                  fov_h_deg=cfg.half_fov_h_deg,
                                  fov_v_deg=cfg.half_fov_v_deg)
        p2, n2 = sim.render_frame(scene_bwd, pos, q_bwd, float(t), rng,
                                  cfg.max_input_points, points_per_box=150,
                                  ground_points=200,
                                  fov_h_deg=cfg.half_fov_h_deg,
                                  fov_v_deg=cfg.half_fov_v_deg)
        frames = Frame(
            points=jnp.asarray(np.stack([p1, p2])),
            n_points=jnp.asarray([n1, n2], jnp.int32),
            sensor_pos=jnp.asarray(np.stack([pos, pos])),
            quat=jnp.asarray(np.stack([q_fwd, q_bwd])),
            timestamp=jnp.asarray([t, t]),
        )
        state, out = step(state, frames)
        assert bool(out.accepted)

    occ, centers, future, state = get_occupancy_map(state, cfg, 0.2)
    c = np.asarray(centers)[np.asarray(occ)]
    above = c[c[:, 2] > 0.5]
    near_fwd = np.linalg.norm(above[:, :2] - np.array([2.0, 0.5]), axis=1) < 0.7
    near_bwd = np.linalg.norm(above[:, :2] - np.array([-2.0, -0.5]), axis=1) < 0.7
    assert near_fwd.sum() > 0, above[:20]
    assert near_bwd.sum() > 0, above[:20]
