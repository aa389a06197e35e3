"""Benchmark: map updates/sec of the DSP-map pipeline on the available
accelerator (one TPU chip under the driver).

Default run measures the flagship DSP-Dynamic configuration
(`include/dsp_dynamic.h:38-50`: 66x66x40 voxels @ 0.15 m, 3 deg pyramids,
9 particles/voxel) fed by the synthetic street scene at the reference node's
input budget (<=5000 points/frame, `src/map_sim_example.cpp:48`), and prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline", "particles_per_sec"}.

``--all`` additionally measures the other BASELINE configs (static,
multi-neighbor, large_urban) and writes the per-config table to
BENCH_DETAIL.json (also embedded in the JSON line under "configs").

Baselines: the reference's single-core per-frame update times measured by
compiling its headers against the stub toolchain in tools/oracle (the repo
publishes no numbers, see BASELINE.md): BASELINE_MEASURED.json for the
flagship; static 36.1 ms and multi-neighbor 33.9 ms from the same harness
(docs/PERF.md).  If `BASELINE_MEASURED.json` is missing, a conservative
placeholder is used and flagged.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

#: reference single-core ms/frame per variant (tools/oracle, docs/PERF.md)
REF_MS = {"static": 36.1, "multi": 33.9}


def main() -> None:
    """Wrapper: run the measurement in a child process with a timeout and one
    retry.  The tunneled TPU's remote-compile service intermittently stalls
    for tens of minutes (docs/PERF.md); a fresh process after killing the
    stalled one reliably recovers, so retrying re-measures honestly rather
    than hanging the harness."""
    if os.environ.get("DSPMAP_BENCH_CHILD") == "1":
        return _measure()
    timeout = 3000 if "--all" in sys.argv else 1500
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env={**os.environ, "DSPMAP_BENCH_CHILD": "1"},
                timeout=timeout,
            )
            if proc.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt} timed out (compile stall); "
                  f"retrying" if attempt == 0 else "# bench failed twice",
                  file=sys.stderr)
    sys.exit(1)


def _bench_config(dm, sim, jax, jnp, cfg, n_warmup=3, n_bench=30, seed=0):
    state = dm.init_state(cfg, jax.random.key(0))
    step = jax.jit(dm.make_step(cfg), donate_argnums=0)
    frames = [
        dm.Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
                 jnp.asarray(q), jnp.asarray(t))
        for p, n, pos, q, t in sim.generate_sequence(
            n_warmup + n_bench, cfg, seed=seed
        )
    ]
    for f in frames[:n_warmup]:
        state, out = step(state, f)
    jax.block_until_ready(out)
    float(jnp.sum(out.weight_sum))  # genuine sync (docs/PERF.md)

    t0 = time.perf_counter()
    for f in frames[n_warmup:]:
        state, out = step(state, f)
    float(jnp.sum(out.weight_sum))
    dt = time.perf_counter() - t0
    return n_bench / dt, int(out.metrics["alive"])


def _bench_multisensor(dm, sim, jax, jnp, n_sensors=2, n_warmup=3,
                       n_bench=20, seed=0):
    """Two-camera fusion on the flagship map (BASELINE config 5): each frame
    carries the same scene cloud from two poses; make_multisensor_step runs
    the measurement stage sequentially per sensor."""
    import numpy as np
    from dspmap_tpu.models.pipeline import (init_multisensor_state,
                                            make_multisensor_step)

    cfg = dm.example_node_settings(dm.dsp_dynamic())
    state = init_multisensor_state(cfg, n_sensors, jax.random.key(0))
    step = jax.jit(make_multisensor_step(cfg, n_sensors), donate_argnums=0)
    frames = []
    for p, n, pos, q, t in sim.generate_sequence(
        n_warmup + n_bench, cfg, seed=seed
    ):
        frames.append(dm.Frame(
            points=jnp.broadcast_to(jnp.asarray(p), (n_sensors,) + p.shape),
            n_points=jnp.full((n_sensors,), n, jnp.int32),
            sensor_pos=jnp.broadcast_to(jnp.asarray(pos), (n_sensors, 3)),
            quat=jnp.broadcast_to(jnp.asarray(q), (n_sensors, 4)),
            timestamp=jnp.full((n_sensors,), t, jnp.float32),
        ))
    for f in frames[:n_warmup]:
        state, out = step(state, f)
    jax.block_until_ready(out)
    float(jnp.sum(out.weight_sum))
    t0 = time.perf_counter()
    for f in frames[n_warmup:]:
        state, out = step(state, f)
    float(jnp.sum(out.weight_sum))
    dt = time.perf_counter() - t0
    return n_bench / dt, int(out.metrics["alive"])


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
    ups, alive = _bench_config(dm, sim, jax, jnp, cfg)

    baseline_file = Path(__file__).parent / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["updates_per_sec"]
    else:
        baseline = 100.0  # placeholder: 10 ms/frame single-core estimate

    result = {
        "metric": "map_updates_per_sec",
        "value": round(ups, 2),
        "unit": "updates/s (66x66x40 @ 0.15m, <=5000 pts/frame)",
        "vs_baseline": round(ups / baseline, 2),
        "particles_per_sec": round(ups * alive),
    }

    if "--all" in sys.argv:
        detail = {
            "dynamic": {
                "updates_per_sec": round(ups, 2),
                "frame_ms": round(1e3 / ups, 2),
                "alive": alive,
                "particles_per_sec": round(ups * alive),
                "vs_reference_cpu": round(ups / baseline, 2),
            }
        }
        others = {
            "static": dm.example_node_settings(dm.dsp_static()),
            "multi": dm.example_node_settings(dm.dsp_dynamic_multi_neighbors()),
            "large_urban": dm.large_urban(),
        }
        for name, c in others.items():
            u, a = _bench_config(
                dm, sim, jax, jnp, c,
                n_bench=10 if name == "large_urban" else 30,
            )
            entry = {
                "updates_per_sec": round(u, 2),
                "frame_ms": round(1e3 / u, 2),
                "alive": a,
                "particles_per_sec": round(u * a),
            }
            if name in REF_MS:
                entry["vs_reference_cpu"] = round(u * REF_MS[name] / 1e3, 2)
            detail[name] = entry
            print(f"# {name}: {json.dumps(entry)}", file=sys.stderr)
        u, a = _bench_multisensor(dm, sim, jax, jnp)
        detail["multisensor_2cam"] = {
            "updates_per_sec": round(u, 2),
            "frame_ms": round(1e3 / u, 2),
            "alive": a,
            "particles_per_sec": round(u * a),
        }
        print(f"# multisensor_2cam: {json.dumps(detail['multisensor_2cam'])}",
              file=sys.stderr)
        (Path(__file__).parent / "BENCH_DETAIL.json").write_text(
            json.dumps(detail, indent=1)
        )
        result["configs"] = detail

    alive_str = alive
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} frame_ms={1e3 / ups:.2f} "
        f"alive_particles={alive_str} baseline_updates_per_sec={baseline}"
        f"{' (placeholder)' if not baseline_file.exists() else ''}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
