"""Map parallelism: shard the voxel grid (and the particles resident in it)
across a device mesh.

The reference has no distributed machinery at all (SURVEY.md section 2.6):
one process, one static array.  Scaling the *spatial extent* of the map
beyond one chip is the mapping analogue of context/sequence parallelism, and
this module provides it the idiomatic JAX way:

* a 1-D ``Mesh`` over the ``"map"`` axis; every ``[.., V]`` state tensor is
  sharded along its voxel axis (contiguous z-slabs of the grid, since storage
  order is z-major, ``geometry.storage_index``),
* per-frame observations (<= 5000 points) and the pyramid structures derived
  from them are tiny and replicated,
* the step function is ordinary ``jax.jit`` over sharded operands: XLA's SPMD
  partitioner keeps the slot-axis reductions, per-voxel resampling cumsums
  and future scatters local to each shard, and inserts collectives exactly
  where the algorithm is genuinely global -- the pass-1 C(z) normalizer
  (a sum over *all* in-FOV particles, reduced in measurement space: one
  small ``psum``-shaped reduction of ``[n_pyramids, (2N+1)^2 * K]``), the
  birth normalizer, and cross-slab particle migration.

Multi-host: initialize ``jax.distributed`` and build the mesh over all
devices; the same jitted step runs SPMD with DCN crossings only inside XLA
collectives.  (A hand-scheduled ``shard_map`` fast path with neighbor
``ppermute`` mover exchange is the planned optimization once profiles show
the GSPMD-inserted collectives dominate; the algorithm above bounds true
cross-slab traffic to movers + the small C reduction.)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MapConfig
from ..state import MapState


MAP_AXIS = "map"


def make_mesh(devices: Sequence[jax.Device] | int | None = None) -> Mesh:
    """1-D device mesh over the ``map`` (spatial-block) axis."""
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        devices = jax.devices()[:devices]
    return Mesh(np.asarray(devices), (MAP_AXIS,))


def state_shardings(mesh: Mesh, state: MapState) -> MapState:
    """A ``MapState``-shaped pytree of ``NamedSharding``s: voxel-axis tensors
    sharded along ``map``, everything else replicated."""
    pflags = state.particles.flags

    def spec_for(leaf):
        shape = leaf.shape
        # [S, V] particle fields and the horizon-major [T, V] future grid
        if len(shape) == 2 and shape[-1] == state.weight_sum.shape[0]:
            return P(None, MAP_AXIS)
        # [V], [V, 3] voxel aggregates
        if len(shape) >= 1 and shape[0] == state.weight_sum.shape[0]:
            return P(MAP_AXIS, *([None] * (len(shape) - 1)))
        # compact layout: [P] particle rows shard along the map axis (each
        # shard's rows hold its slab's particles -- the rebin exchange
        # maintains the ownership invariant)
        if (
            len(pflags.shape) == 1
            and len(shape) == 1
            and shape[0] == pflags.shape[0]
        ):
            return P(MAP_AXIS)
        return P()  # replicated scalars / estimator / rng

    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), state
    )


def shard_state(state: MapState, mesh: Mesh) -> MapState:
    """Place an existing state onto the mesh with the canonical shardings."""
    return jax.device_put(state, state_shardings(mesh, state))


def make_sharded_step(cfg: MapConfig, mesh: Mesh, step=None,
                      template_state: MapState | None = None,
                      template_frame=None):
    """Jit the per-frame step with explicitly PINNED in/out shardings.

    ``frame`` inputs are replicated (every chip sees the whole observation);
    the new state is constrained to the canonical map sharding -- layout
    stability across steps is enforced, not left to sharding propagation.
    ``StepOutput`` leaves with a leading voxel axis (the weight grid) stay
    sharded; everything else (metrics scalars, estimator cloud) is
    replicated.  Pass ``template_state`` / ``template_frame`` for
    non-default shapes (e.g. ``init_multisensor_state`` with its leading
    sensor axis).
    """
    import jax.numpy as jnp

    from ..models.pipeline import Frame, make_step
    from ..state import init_state

    step = step or make_step(cfg)
    if template_state is None:
        template_state = jax.eval_shape(
            lambda: init_state(cfg, jax.random.key(0))
        )
    if template_frame is None:
        template_frame = Frame(
            points=jax.ShapeDtypeStruct(
                (cfg.max_input_points, 3), jnp.float32
            ),
            n_points=jax.ShapeDtypeStruct((), jnp.int32),
            sensor_pos=jax.ShapeDtypeStruct((3,), jnp.float32),
            quat=jax.ShapeDtypeStruct((4,), jnp.float32),
            timestamp=jax.ShapeDtypeStruct((), jnp.float32),
        )
    st_shardings = state_shardings(mesh, template_state)
    repl = NamedSharding(mesh, P())
    V = cfg.storage_voxels

    def out_sharding(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == V:
            return NamedSharding(
                mesh, P(MAP_AXIS, *([None] * (leaf.ndim - 1)))
            )
        return repl

    out_tmpl = jax.eval_shape(step, template_state, template_frame)
    return jax.jit(
        step,
        in_shardings=(
            st_shardings,
            jax.tree.map(lambda _: repl, template_frame),
        ),
        out_shardings=(st_shardings, jax.tree.map(out_sharding, out_tmpl[1])),
        donate_argnums=0,
    )
