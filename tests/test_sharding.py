"""Map-parallel sharding: the full step compiles and runs SPMD on a virtual
8-device CPU mesh and agrees with the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspmap_tpu import dsp_dynamic, init_state, make_step, Frame
from dspmap_tpu.parallel import make_mesh, shard_state, state_shardings
from dspmap_tpu.utils import sim


def cfg_for(n_devices):
    return dsp_dynamic(
        nx=16, ny=16, nz=4 * n_devices,
        max_input_points=512,
        mover_capacity=2048,
        pyramid_slot_capacity=32,
        max_clusters=8,
        newborn_particles_per_point=4,
    )


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_step_matches_single_device(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    cfg = cfg_for(n_devices)
    step = make_step(cfg)

    frames = []
    for pts, n, pos, quat, t in sim.generate_sequence(3, cfg, seed=5):
        frames.append(Frame(jnp.asarray(pts), jnp.int32(n), jnp.asarray(pos),
                            jnp.asarray(quat), jnp.asarray(t)))

    # single device
    s1 = init_state(cfg, jax.random.key(0))
    step1 = jax.jit(step)
    for f in frames:
        s1, o1 = step1(s1, f)

    # sharded
    mesh = make_mesh(n_devices)
    s2 = shard_state(init_state(cfg, jax.random.key(0)), mesh)
    step2 = jax.jit(step, in_shardings=(state_shardings(mesh, s2), None))
    for f in frames:
        s2, o2 = step2(s2, f)

    # SPMD must be numerically identical to single-device execution
    np.testing.assert_array_equal(
        np.asarray(s1.particles.flags), np.asarray(s2.particles.flags)
    )
    np.testing.assert_allclose(
        np.asarray(s1.weight_sum), np.asarray(s2.weight_sum), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.future), np.asarray(s2.future), rtol=1e-5
    )
    assert int(o1.metrics["alive"]) == int(o2.metrics["alive"])

    # the sharded state really is distributed
    shards = s2.particles.weight.sharding
    assert len(shards.device_set) == n_devices


def test_make_sharded_step_pins_layout():
    """make_sharded_step pins in/out shardings: chained steps keep the
    canonical map sharding (no propagation drift) and match the
    single-device run."""
    from dspmap_tpu.parallel import make_sharded_step

    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg = cfg_for(n_dev)
    frames = [
        Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
              jnp.asarray(q), jnp.asarray(t))
        for p, n, pos, q, t in sim.generate_sequence(3, cfg, seed=5)
    ]

    s1 = init_state(cfg, jax.random.key(0))
    step1 = jax.jit(make_step(cfg))
    for f in frames:
        s1, o1 = step1(s1, f)

    mesh = make_mesh(n_dev)
    step2 = make_sharded_step(cfg, mesh)
    s2 = shard_state(init_state(cfg, jax.random.key(0)), mesh)
    want = state_shardings(mesh, s2)
    for f in frames:
        s2, o2 = step2(s2, f)
        assert s2.particles.weight.sharding.is_equivalent_to(
            want.particles.weight, s2.particles.weight.ndim
        )
        assert o2.weight_sum.sharding.spec == want.weight_sum.spec

    np.testing.assert_allclose(
        np.asarray(s1.weight_sum), np.asarray(s2.weight_sum), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(s1.particles.flags), np.asarray(s2.particles.flags)
    )


def test_graft_entry_dryrun():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_multisensor_step():
    """Map parallelism composes with multi-sensor fusion."""
    import numpy as np
    from dspmap_tpu.models.pipeline import (
        make_multisensor_step, init_multisensor_state,
    )
    from dspmap_tpu.utils import sim

    n_dev, n_sensors = 4, 2
    cfg = cfg_for(n_dev)
    mesh = make_mesh(n_dev)
    state = init_multisensor_state(cfg, n_sensors, jax.random.key(0))
    state = jax.device_put(state, state_shardings(mesh, state))
    step = jax.jit(make_multisensor_step(cfg, n_sensors))

    rng = np.random.default_rng(0)
    pos = np.zeros(3, np.float32)
    qf = np.array([1.0, 0, 0, 0], np.float32)
    qb = np.array([0.0, 0, 0, 1.0], np.float32)
    scene = sim.street_scene(0)
    for i in range(2):
        t = np.float32(0.1 * i)
        p1, n1 = sim.render_frame(scene, pos, qf, float(t), rng,
                                  cfg.max_input_points,
                                  fov_h_deg=cfg.half_fov_h_deg,
                                  fov_v_deg=cfg.half_fov_v_deg)
        p2, n2 = sim.render_frame(scene, pos, qb, float(t), rng,
                                  cfg.max_input_points,
                                  fov_h_deg=cfg.half_fov_h_deg,
                                  fov_v_deg=cfg.half_fov_v_deg)
        frames = Frame(
            points=jnp.asarray(np.stack([p1, p2])),
            n_points=jnp.asarray([n1, n2], jnp.int32),
            sensor_pos=jnp.asarray(np.stack([pos, pos])),
            quat=jnp.asarray(np.stack([qf, qb])),
            timestamp=jnp.asarray([t, t]),
        )
        state, out = step(state, frames)
        assert bool(out.accepted)
    assert len(state.particles.weight.sharding.device_set) == n_dev
