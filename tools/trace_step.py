"""Capture a device trace of the full step and print the per-source hotspot
table (the round-2 optimization workflow; docs/PERF.md)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

import dspmap_tpu as dm
from dspmap_tpu.utils import sim
from dspmap_tpu.utils.profiling import force_sync, summarize_device_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="dynamic",
                    choices=["dynamic", "static", "multi", "large"])
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/dspmap_trace")
    args = ap.parse_args()

    cfg = {
        "dynamic": lambda: dm.example_node_settings(dm.dsp_dynamic()),
        "static": lambda: dm.example_node_settings(dm.dsp_static()),
        "multi": lambda: dm.example_node_settings(dm.dsp_dynamic_multi_neighbors()),
        "large": lambda: dm.large_urban(),
    }[args.variant]()
    state = dm.init_state(cfg, jax.random.key(0))
    step = jax.jit(
        dm.make_step(cfg, admission_control=False), donate_argnums=0
    )

    frames = [
        dm.Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
                 jnp.asarray(q), jnp.asarray(t))
        for p, n, pos, q, t in sim.generate_sequence(
            args.frames + 5, cfg, seed=0
        )
    ]
    for f in frames[:5]:
        state, out = step(state, f)
    force_sync(out.weight_sum)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for f in frames[5:]:
            state, out = step(state, f)
        force_sync(out.weight_sum)
    wall = (time.perf_counter() - t0) / args.frames
    print(f"variant={args.variant} ~{wall * 1e3:.2f} ms/frame (wall, incl sync)")

    total = 0.0
    for ms, src, op in summarize_device_trace(args.logdir, args.top):
        per = ms / args.frames
        total += per
        print(f"{per:8.3f} ms  {op:<22} {src}")
    print(f"{'':8}     total listed: {total:.2f} ms/frame")


if __name__ == "__main__":
    main()
