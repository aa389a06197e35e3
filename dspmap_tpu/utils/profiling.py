"""Tracing/profiling helpers (the reference's instrumentation is clock()
prints + a /map_update_time topic, SURVEY.md section 5.1).

* :func:`timed_steps` -- wall-time per frame with correct device sync
  semantics for remote backends (see docs/PERF.md: ``block_until_ready`` may
  not block; a scalar read does),
* :func:`trace` -- context manager around ``jax.profiler`` producing
  perfetto-compatible traces,
* :func:`summarize_device_trace` -- aggregate device time by source line
  from a captured trace (the workflow used to optimize this codebase).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time

import jax


def force_sync(tree) -> float:
    """Genuinely wait for device results (scalar readback)."""
    leaf = jax.tree.leaves(tree)[0]
    return float(leaf.ravel()[0])


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def timed_steps(step, state, frames, sync_every: int = 1):
    """Run ``step`` over ``frames`` returning (state, wall_seconds_per_frame).

    ``sync_every=1`` gives per-frame latency; larger values amortize the
    sync cost for throughput measurements.
    """
    walls = []
    t0 = time.perf_counter()
    for i, frame in enumerate(frames):
        state, out = step(state, frame)
        if (i + 1) % sync_every == 0:
            force_sync(out.weight_sum)
            walls.append((time.perf_counter() - t0) / sync_every)
            t0 = time.perf_counter()
    return state, walls


def summarize_device_trace(log_dir: str, top: int = 25):
    """Aggregate device op time by (source line, op kind) from the newest
    trace under ``log_dir``.  Returns a sorted list of (ms, source, op)."""
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    agg = collections.Counter()
    for e in data.get("traceEvents", []):
        a = e.get("args", {})
        if e.get("ph") == "X" and "device_duration_ps" in a:
            if e["name"].startswith(("jit_", "conditional")):
                continue
            agg[(a.get("source", "?"), e["name"].split(".")[0])] += (
                int(a["device_duration_ps"]) / 1e9
            )
    return sorted(
        ((ms, src, op) for (src, op), ms in agg.items()), reverse=True
    )[:top]
