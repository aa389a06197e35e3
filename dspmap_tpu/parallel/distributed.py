"""Multi-host initialization and the weak-scaling benchmark harness.

The reference has no distributed machinery (SURVEY.md section 2.6); scaling
the map across hosts is this framework's addition.  Transport is owned
entirely by the XLA runtime: `jax.distributed.initialize` wires the hosts,
the map-parallel mesh (``parallel.sharding``) spans all devices, and the
jitted step's collectives ride ICI within a host and DCN across hosts.

Usage (per host)::

    from dspmap_tpu.parallel import distributed, make_mesh, shard_state
    distributed.init()              # env-driven (TPU pods auto-configure)
    mesh = make_mesh()              # all global devices
    state = shard_state(init_state(cfg, key), mesh)
    ...

Single-machine rehearsal: ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
with the CPU backend exercises the same sharded program (tests/test_sharding.py).
"""

from __future__ import annotations

import jax


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize multi-host JAX.  On TPU pods all arguments are discovered
    from the environment; on CPU/GPU clusters pass them explicitly."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured): nothing to do
        pass


def is_coordinator() -> bool:
    return jax.process_index() == 0
