"""Multi-sensor fusion: two cameras looking at disjoint halves of a scene
must jointly map structure neither sees alone."""

import numpy as np
import jax
import jax.numpy as jnp

from dspmap_tpu import dsp_dynamic, example_node_settings, get_occupancy_map, Frame
from dspmap_tpu.models.pipeline import make_multisensor_step, init_multisensor_state
from dspmap_tpu.utils import sim


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
