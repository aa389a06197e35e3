"""Hand-scheduled shard_map fast path (parallel/shard_step.py): runs SPMD on
the virtual CPU mesh and agrees with the single-device step.

Cross-shard arrival order is shard-major (documented deviation,
ops/fov.py), so slot *placement* inside a voxel may legally differ from the
single-device run; every per-voxel aggregate and every global counter must
match exactly (uncontested capacities -- this scene's load is far below
them).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspmap_tpu import dsp_dynamic, dsp_static, init_state, make_step, Frame
from dspmap_tpu.parallel import make_mesh, shard_state
from dspmap_tpu.parallel.shard_step import make_shardmap_step
from dspmap_tpu.utils import sim


def cfg_for(n_devices, base=dsp_dynamic):
    return base(
        nx=16, ny=16, nz=4 * n_devices,
        max_input_points=512,
        mover_capacity=2048,
        pyramid_slot_capacity=32,
        max_clusters=8,
        newborn_particles_per_point=4,
    )


def _frames(cfg, n=4, seed=5):
    return [
        Frame(jnp.asarray(p), jnp.int32(np_), jnp.asarray(pos),
              jnp.asarray(q), jnp.asarray(t))
        for p, np_, pos, q, t in sim.generate_sequence(n, cfg, seed=seed)
    ]


def _voxel_flag_counts(flags):
    f = np.asarray(flags)
    return np.stack([(f == k).sum(axis=0) for k in (1, 2, 3)])


@pytest.mark.parametrize("base", [dsp_dynamic, dsp_static])
def test_shardmap_step_matches_single_device(base):
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg = cfg_for(n_dev, base)
    frames = _frames(cfg)

    s1 = init_state(cfg, jax.random.key(0))
    step1 = jax.jit(make_step(cfg))
    for f in frames:
        s1, o1 = step1(s1, f)

    mesh = make_mesh(n_dev)
    step2 = make_shardmap_step(cfg, mesh)
    s2 = shard_state(init_state(cfg, jax.random.key(0)), mesh)
    for f in frames:
        s2, o2 = step2(s2, f)

    assert bool(o1.accepted) and bool(o2.accepted)
    np.testing.assert_allclose(
        np.asarray(s1.weight_sum), np.asarray(s2.weight_sum), rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s1.future), np.asarray(s2.future), rtol=1e-5, atol=1e-7
    )
    # per-voxel particle populations identical (slot order may permute)
    np.testing.assert_array_equal(
        _voxel_flag_counts(s1.particles.flags),
        _voxel_flag_counts(s2.particles.flags),
    )
    for k in ("alive", "born", "movers", "in_fov", "updated_particles",
              "culled"):
        assert int(o1.metrics[k]) == int(o2.metrics[k]), k

    # the state really is distributed
    assert len(s2.particles.weight.sharding.device_set) == n_dev


def test_shardmap_rejects_noisy_path():
    import dataclasses

    cfg = dataclasses.replace(cfg_for(2), limit_motion_to_xy_plane=False)
    with pytest.raises(NotImplementedError):
        make_step(cfg, shard=object())  # type: ignore[arg-type]
