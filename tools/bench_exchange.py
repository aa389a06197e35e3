"""Measure the shard_map mover exchange: full ``all_gather`` vs neighbor
``ppermute`` ring (SURVEY.md section 7.1.7) on the virtual 8-device CPU mesh.

Two kinds of evidence (the virtual mesh shares one socket's silicon, so
wall-clock alone is a weak proxy for ICI behavior):

* steady-state step wall time under each exchange (plus equality of the map
  aggregates between the two, and the ring-undelivered counter = 0);
* the analytic per-frame exchange traffic, which IS the quantity ICI cost
  scales with: all_gather moves ``(n-1) * buf`` bytes per shard per site,
  the ring ``2 * hops * buf``.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_exchange.py
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dspmap_tpu import dsp_dynamic, init_state, Frame  # noqa: E402
from dspmap_tpu.parallel import make_mesh, shard_state  # noqa: E402
from dspmap_tpu.parallel.shard_step import make_shardmap_step  # noqa: E402
from dspmap_tpu.utils import sim  # noqa: E402

N_DEV = 8
WARM = 4
MEASURE = 24


def build(exchange: str):
    cfg = dsp_dynamic(
        nx=16, ny=16, nz=4 * N_DEV, voxel_resolution=0.5,
        max_input_points=512, mover_capacity=2048,
        pyramid_slot_capacity=32, max_clusters=8,
        newborn_particles_per_point=4,
        mover_exchange=exchange,
    ).validate()
    mesh = make_mesh(N_DEV)
    step = make_shardmap_step(cfg, mesh)
    state = shard_state(init_state(cfg, jax.random.key(0)), mesh)
    frames = [
        Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
              jnp.asarray(q), jnp.asarray(t))
        for p, n, pos, q, t in sim.generate_sequence(
            WARM + MEASURE, cfg, seed=5)
    ]
    return cfg, step, state, frames


def run(exchange: str):
    cfg, step, state, frames = build(exchange)
    out = None
    for f in frames[:WARM]:
        state, out = step(state, f)
    jax.block_until_ready(out.weight_sum)
    t0 = time.perf_counter()
    for f in frames[WARM:]:
        state, out = step(state, f)
    # genuine sync: read a scalar
    overflow = int(out.metrics["mover_overflow_killed"])
    wall = (time.perf_counter() - t0) / MEASURE
    return {
        "exchange": exchange,
        "step_ms": round(wall * 1e3, 2),
        "mover_overflow_killed": overflow,
        "alive": int(out.metrics["alive"]),
        "weight_sum_total": float(np.asarray(state.weight_sum).sum()),
        # per-shard per-site traffic in mover-buffer units
        "buffers_moved_per_site": (
            N_DEV - 1 if exchange == "all_gather" else 2 * cfg.ring_hops
        ),
        "mover_buffer_bytes": cfg.mover_capacity * 10 * 4,  # 10 lanes f32
    }


def main():
    results = [run("all_gather"), run("ring")]
    for r in results:
        print(json.dumps(r))
    a, b = results
    assert abs(a["weight_sum_total"] - b["weight_sum_total"]) <= (
        1e-5 * abs(a["weight_sum_total"]) + 1e-6
    ), "exchange variants diverged"
    print(json.dumps({
        "traffic_ratio_allgather_over_ring":
            a["buffers_moved_per_site"] / b["buffers_moved_per_site"],
        "step_ms_ratio": round(a["step_ms"] / b["step_ms"], 3),
    }))


if __name__ == "__main__":
    main()
