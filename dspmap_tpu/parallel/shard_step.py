"""Hand-scheduled ``shard_map`` fast path for the map-parallel step.

The GSPMD path (:mod:`.sharding`) jits the unmodified step over sharded
operands and lets XLA's partitioner place collectives.  This module is the
explicit alternative SURVEY.md section 2.6/7.1.7 names (the reference has no
distributed machinery at all -- cite of absence): the step body runs
per-shard on a contiguous slab of the storage grid with every cross-shard
interaction hand-placed:

* ``psum`` of the ``[n_pyr, (2N+1)^2 K]`` C(z) partials -- the measurement
  update's only cross-particle reduction (ops/update.py),
* ``all_gather`` + ownership-masked insertion of the compacted mover and
  future-mover buffers -- the only particle traffic that crosses slabs
  (ops/fov.py ``rebin_and_register``, ops/occupancy.py),
* ``psum`` of the birth DS-classification sums; the newborn table itself is
  replicated compute from replicated RNG, each shard inserting only the
  candidates whose jittered voxel it owns (ops/birth.py),
* ``psum`` of the per-shard metric counters (models/pipeline.py).

Observations, estimator state and RNG keys are replicated; per-shard results
stay bitwise identical across shards for every replicated quantity (the
estimator and the newborn table are replicated compute from replicated
keys).  Pool-shaped noise draws -- absent on the fused-sweep configurations
(the reference's own noise quirk, ops/propagate.py), present on noisy
dynamic configs -- fold the shard index into their keys so each slab draws
independent noise (models/pipeline.py).

Semantic deviations vs the single-device step (both bounded by capacity
contention, none by steady-state behavior):

* per-shard capacities: the FOV dense tier, spill buffer and mover buffers
  exist per shard, so an N-shard mesh tolerates N times the global load
  before overflow -- strictly more permissive, identical when uncontested;
* cross-shard arrival order is shard-major rather than pool-flat order, so
  which candidate wins the last slot of a *contested* voxel can differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import MapConfig
from ..ops.common import ShardCtx
from .sharding import MAP_AXIS, make_mesh, state_shardings


def make_shardmap_step(cfg: MapConfig, mesh=None, with_metrics: bool = True):
    """Build the explicitly scheduled sharded step: ``step(state, frame)``
    with state sharded along the map axis (``shard_state``) and the frame
    replicated.  Covers every variant (fused-sweep limit-xy / static AND
    noisy propagation); see :func:`~..models.pipeline.make_step` for the
    shard semantics.
    """
    from ..models.pipeline import Frame, StepOutput, make_step
    from ..state import init_state

    mesh = mesh if mesh is not None else make_mesh()
    n = mesh.devices.size
    V = cfg.storage_voxels
    if V % n != 0:
        raise ValueError(f"storage_voxels {V} not divisible by mesh size {n}")
    if cfg.layout == "compact" and cfg.compact_capacity % n != 0:
        raise ValueError(
            f"compact_capacity {cfg.compact_capacity} not divisible by "
            f"mesh size {n}"
        )
    v_local = V // n

    def body(state, frame):
        lo = jax.lax.axis_index(MAP_AXIS).astype(jnp.int32) * v_local
        shard = ShardCtx(axis=MAP_AXIS, n_shards=n, lo=lo)
        step = make_step(cfg, with_metrics=with_metrics, shard=shard)
        return step(state, frame)

    template_state = jax.eval_shape(lambda: init_state(cfg, jax.random.key(0)))
    st_shardings = state_shardings(mesh, template_state)
    st_specs = jax.tree.map(lambda s: s.spec, st_shardings)

    template_frame = Frame(
        points=jax.ShapeDtypeStruct((cfg.max_input_points, 3), jnp.float32),
        n_points=jax.ShapeDtypeStruct((), jnp.int32),
        sensor_pos=jax.ShapeDtypeStruct((3,), jnp.float32),
        quat=jax.ShapeDtypeStruct((4,), jnp.float32),
        timestamp=jax.ShapeDtypeStruct((), jnp.float32),
    )
    frame_specs = jax.tree.map(lambda _: P(), template_frame)

    def out_spec(leaf):
        return P(MAP_AXIS, *([None] * (leaf.ndim - 1))) if (
            leaf.ndim >= 1 and leaf.shape[0] == V
        ) else P()

    out_shapes = jax.eval_shape(
        lambda s, f: make_step(cfg, with_metrics=with_metrics)(s, f),
        template_state, template_frame,
    )
    out_specs = (st_specs, jax.tree.map(out_spec, out_shapes[1]))

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(st_specs, frame_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
