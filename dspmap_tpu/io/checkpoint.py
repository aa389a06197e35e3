"""Checkpoint / resume.

The reference can only *dump* particles to CSV (write-only,
``include/dsp_dynamic.h:325-350``); the map cannot resume.  Here the whole
filter state is a pytree of arrays, so checkpointing is exact and symmetric:
every particle, voxel aggregate, RNG key, window origin and estimator track
survives a save/load round trip bit-for-bit.

Two backends: a dependency-free ``.npz`` writer (default) and orbax
(``save_state(..., backend="orbax")``) for async/multi-host checkpointing of
sharded states.
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


def load_state(template: MapState, path, backend: str = "npz") -> MapState:
    """Restore into the structure of ``template`` (same config/shapes)."""
    path = Path(path)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), template)
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
    return jax.tree.unflatten(treedef, new_leaves)
