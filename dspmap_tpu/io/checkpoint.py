"""Checkpoint / resume.

The reference can only *dump* particles to CSV (write-only,
``include/dsp_dynamic.h:325-350``); the map cannot resume.  Here the whole
filter state is a pytree of arrays, so checkpointing is exact and symmetric:
every particle, voxel aggregate, RNG key, window origin and estimator track
survives a save/load round trip bit-for-bit.

Two backends: a dependency-free ``.npz`` writer (default) and orbax
(``save_state(..., backend="orbax")``) for async/multi-host checkpointing of
sharded states.

Config-switch hazard (velocity-clamp invariant): the pipeline maintains
"velocities conform to the motion model" as a *write-site* invariant (vz==0
on every valid slot under ``limit_motion_to_xy_plane``, v==0 under the
static model -- models/pipeline.py), and the Pallas occupancy kernel elides
the invariant-zero planes from its I/O on the strength of it
(ops/pallas/occupancy.py).  A state checkpointed under a *free-motion*
config and resumed under a clamped one violates the invariant: dead slots
(and, for the first frame, valid slots) may carry nonzero clamped
components, which the elision would pass through as garbage on resample
copies.  :func:`load_state` therefore re-applies the clamp for the
template's config (``sanitize=True`` default) -- a no-op for matched
configs, the exact reference clamp semantics (dsp_dynamic.h:661-663,
dsp_static.h:640-646) for a config switch.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..state import MapState


def _flatten_with_names(state: MapState):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save_state(state: MapState, path, backend: str = "npz") -> None:
    path = Path(path)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), state)
        ckptr.wait_until_finished()
        return
    leaves, _ = _flatten_with_names(state)
    arrays = {}
    for i, x in enumerate(leaves):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)  # PRNG keys are opaque; store raw data
        arrays[f"leaf_{i}"] = np.asarray(jax.device_get(x))
    np.savez_compressed(path, **arrays)


def load_state(template: MapState, path, backend: str = "npz",
               cfg=None, sanitize: bool = True) -> MapState:
    """Restore into the structure of ``template`` (same config/shapes).

    ``cfg`` (a :class:`~dspmap_tpu.config.MapConfig`) enables the
    config-switch sanitizer (module docstring): the motion model's velocity
    clamp is re-applied on load so the pipeline's clamp invariant holds even
    for states written under a different motion model.  Pass
    ``sanitize=False`` to skip (bit-exact restore)."""
    path = Path(path)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(path.resolve(), template)
        return _sanitize(state, cfg) if sanitize else state
    leaves, treedef = _flatten_with_names(template)
    with np.load(path) as data:
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                leaf.dtype, jax.dtypes.prng_key
            ):
                new_leaves.append(
                    jax.random.wrap_key_data(arr.astype(np.uint32))
                )
            else:
                new_leaves.append(arr)
    state = jax.tree.unflatten(treedef, new_leaves)
    return _sanitize(state, cfg) if sanitize else state


def _sanitize(state: MapState, cfg) -> MapState:
    """Re-apply the motion model's velocity clamp (dsp_dynamic.h:661-663,
    dsp_static.h:640-646) -- a no-op for states written under the same
    config; restores the pipeline's clamp invariant after a config switch."""
    import dataclasses

    if cfg is None:
        return state
    p = state.particles
    if cfg.motion_model == "static":
        z = np.zeros_like(np.asarray(p.vx))
        p = dataclasses.replace(p, vx=z, vy=z, vz=z)
    elif cfg.limit_motion_to_xy_plane:
        p = dataclasses.replace(p, vz=np.zeros_like(np.asarray(p.vz)))
    else:
        return state
    return dataclasses.replace(state, particles=p)
