"""Variant coverage: multi-neighbor configuration end-to-end, the tuner
mapping, viz exports, and the config validation surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspmap_tpu import (
    MapConfig, dsp_dynamic, dsp_dynamic_multi_neighbors, dsp_static,
    performance_level_parameters, example_node_settings,
    init_state, make_step, get_occupancy_map, Frame,
)
from dspmap_tpu.utils import sim, viz


def test_preset_derived_shapes_match_reference_constants():
    d = dsp_dynamic()
    # dsp_dynamic.h:58-66 derived values
    assert (d.n_pyramids_h, d.n_pyramids_v, d.n_pyramids) == (28, 16, 448)
    assert d.slots_per_voxel == 18
    assert d.pyramid_slots == 464  # 462 rounded up to a multiple of 8
    assert d.voxel_num == 66 * 66 * 40

    m = dsp_dynamic_multi_neighbors()
    assert (m.n_pyramids_h, m.n_pyramids_v) == (84, 54)
    assert m.neighbor_cells == 25
    assert m.slots_per_voxel == 60

    s = dsp_static()
    assert s.motion_model == "static"
    assert s.slots_per_voxel == 50  # x5 safety factor (dsp_static.h:63)
    assert (s.n_pyramids_h, s.n_pyramids_v) == (28, 18)


def test_multi_neighbor_variant_end_to_end():
    cfg = example_node_settings(dsp_dynamic_multi_neighbors(
        nx=16, ny=16, nz=8, voxel_resolution=0.25,
        half_fov_h_deg=20, half_fov_v_deg=12, angle_resolution_deg=2,
        max_particles_per_voxel=6,
        max_input_points=256, mover_capacity=2048,
        pyramid_slot_capacity=24, max_clusters=8,
        newborn_particles_per_point=4,
    ))
    assert cfg.pyramid_neighbor_radius == 2 and cfg.neighbor_cells == 25
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    scene = sim.Scene(boxes=[
        sim.Box(np.array([1.5, 0.3, 1.0]), np.array([0.5, 0.5, 1.5]),
                np.zeros(3))], ground_extent=3.0)
    for pts, n, pos, quat, t in sim.generate_sequence(
        5, cfg, scene=scene, speed=0.2
    ):
        state, out = step(state, Frame(jnp.asarray(pts), jnp.int32(n),
                                       jnp.asarray(pos), jnp.asarray(quat),
                                       jnp.asarray(t)))
        assert bool(out.accepted)
    occ, centers, future, state = get_occupancy_map(state, cfg, 0.2)
    assert int(np.asarray(occ).sum()) > 3


def test_performance_level_mapping_matches_tuner():
    # piecewise map of set_map_parameters.py:459-475
    lo = performance_level_parameters(25, voxel_resolution=0.15)
    assert lo["angle_resolution_deg"] == 1 and lo["voxel_filter_resolution"] == 0.2
    assert lo["particle_density"] == int(2000 * 5 / 15 + 1000)
    mid = performance_level_parameters(60, voxel_resolution=0.15)
    assert mid["angle_resolution_deg"] == 3
    assert mid["voxel_filter_resolution"] == 0.15
    hi = performance_level_parameters(100, voxel_resolution=0.15)
    assert hi["particle_density"] == 6000
    assert hi["max_particles_per_voxel"] == int(6000 * 0.15**3)
    # occupancy threshold by resolution (:428-433)
    assert performance_level_parameters(60, voxel_resolution=0.15)[
        "occupancy_threshold"] == 0.2
    assert performance_level_parameters(60, voxel_resolution=0.2)[
        "occupancy_threshold"] == 0.5
    assert performance_level_parameters(60, voxel_resolution=0.3)[
        "occupancy_threshold"] == 0.6
    # FOV clipped to angle-resolution multiples (:443-452)
    p = performance_level_parameters(60, fov_angle_h=87, fov_angle_v=51)
    assert p["half_fov_h_deg"] % 3 == 0 and p["half_fov_v_deg"] % 3 == 0


def test_config_validation():
    with pytest.raises(ValueError):
        MapConfig(angle_resolution_deg=7).validate()
    with pytest.raises(ValueError):
        MapConfig(half_fov_h_deg=43).validate()
    with pytest.raises(ValueError):
        MapConfig(motion_model="wobbly").validate()


def test_viz_exports(tmp_path):
    cfg = example_node_settings(dsp_dynamic(
        nx=16, ny=16, nz=8, voxel_resolution=0.25,
        max_input_points=256, mover_capacity=2048,
        pyramid_slot_capacity=32, max_clusters=8,
        newborn_particles_per_point=4,
    ))
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    for pts, n, pos, quat, t in sim.generate_sequence(4, cfg, seed=1):
        state, _ = step(state, Frame(jnp.asarray(pts), jnp.int32(n),
                                     jnp.asarray(pos), jnp.asarray(quat),
                                     jnp.asarray(t)))
    from dspmap_tpu import read_occupancy
    occ, centers, future, weight, state = read_occupancy(state, cfg, 0.2)
    n = viz.export_occupancy_ply(tmp_path / "occ.ply", centers, occ, weight)
    assert (tmp_path / "occ.ply").read_text().startswith("ply")
    m = viz.export_future_layer_ply(tmp_path / "future.ply", cfg,
                                    np.asarray(centers), np.asarray(future))
    assert m == cfg.n_horizons * cfg.nx * cfg.ny
