"""Benchmark: map updates/sec of the full-size DSP-Dynamic pipeline on the
available accelerator (one TPU chip under the driver).

Workload parity with the reference's default dynamic configuration
(`include/dsp_dynamic.h:38-50`: 66x66x40 voxels @ 0.15 m, 3 deg pyramids,
9 particles/voxel) fed by the synthetic street scene at the reference node's
input budget (<=5000 points/frame, `src/map_sim_example.cpp:48`).

Baseline: the reference's single-core per-frame update time measured by
compiling its header against the stub toolchain in tools/oracle (the repo
publishes no numbers, see BASELINE.md).  If `BASELINE_MEASURED.json` is
missing, a conservative 10 ms/frame (100 updates/sec) placeholder is used and
flagged in the output.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def main() -> None:
    """Wrapper: run the measurement in a child process with a timeout and one
    retry.  The tunneled TPU's remote-compile service intermittently stalls
    for tens of minutes (docs/PERF.md); a fresh process after killing the
    stalled one reliably recovers, so retrying re-measures honestly rather
    than hanging the harness."""
    if os.environ.get("DSPMAP_BENCH_CHILD") == "1":
        return _measure()
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "DSPMAP_BENCH_CHILD": "1"},
                timeout=1500,
            )
            if proc.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt} timed out (compile stall); "
                  f"retrying" if attempt == 0 else "# bench failed twice",
                  file=sys.stderr)
    sys.exit(1)


def _measure() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the tunneled-TPU remote compile of the
    # full step module is minutes-slow; cache it across bench runs.
    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_threefry_partitionable", True)

    sys.path.insert(0, str(Path(__file__).parent))
    import dspmap_tpu as dm
    from dspmap_tpu.utils import sim

    cfg = dm.example_node_settings(dm.dsp_dynamic())
    state = dm.init_state(cfg, jax.random.key(0))
    step = jax.jit(dm.make_step(cfg), donate_argnums=0)

    n_warmup, n_bench = 3, 30
    frames = []
    for pts, n, pos, quat, t in sim.generate_sequence(
        n_warmup + n_bench, cfg, seed=0
    ):
        frames.append(
            dm.Frame(
                jnp.asarray(pts), jnp.int32(n), jnp.asarray(pos),
                jnp.asarray(quat), jnp.asarray(t),
            )
        )

    for f in frames[:n_warmup]:
        state, out = step(state, f)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for f in frames[n_warmup:]:
        state, out = step(state, f)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    updates_per_sec = n_bench / dt

    baseline_file = Path(__file__).parent / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["updates_per_sec"]
    else:
        baseline = 100.0  # placeholder: 10 ms/frame single-core estimate

    alive = int(out.metrics["alive"])
    result = {
        "metric": "map_updates_per_sec",
        "value": round(updates_per_sec, 2),
        "unit": "updates/s (66x66x40 @ 0.15m, <=5000 pts/frame)",
        "vs_baseline": round(updates_per_sec / baseline, 2),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} frame_ms={1e3 / updates_per_sec:.2f} "
        f"alive_particles={alive} baseline_updates_per_sec={baseline}"
        f"{' (placeholder)' if not baseline_file.exists() else ''}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
