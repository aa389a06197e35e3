"""Per-fusion trace detail: print the top individual fusions of the newest
trace (name, device ms/frame, source), then dump each one's HLO computation
from the compiled step so the actual op mix is visible (the per-line summary
in trace_step.py aggregates away multi-op fusions)."""

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def top_fusions(log_dir: str, frames: int, top: int):
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    agg = collections.Counter()
    src = {}
    for e in data.get("traceEvents", []):
        a = e.get("args", {})
        if e.get("ph") == "X" and "device_duration_ps" in a:
            if e["name"].startswith(("jit_", "conditional")):
                continue
            agg[e["name"]] += int(a["device_duration_ps"]) / 1e9
            src[e["name"]] = a.get("source", "?")
    rows = agg.most_common(top)
    return [(ms / frames, name, src[name]) for name, ms in rows]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="dynamic")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--logdir", default="/tmp/dspmap_trace")
    ap.add_argument("--hlo", action="store_true",
                    help="also dump each fusion's HLO computation")
    args = ap.parse_args()

    rows = top_fusions(args.logdir, args.frames, args.top)
    for ms, name, source in rows:
        print(f"{ms:8.3f} ms  {name:32s} {source}")

    if not args.hlo:
        return

    import jax
    import jax.numpy as jnp
    import dspmap_tpu as dm
    from dspmap_tpu.utils import sim

    cfg = {
        "dynamic": lambda: dm.example_node_settings(dm.dsp_dynamic()),
        "static": lambda: dm.example_node_settings(dm.dsp_static()),
        "multi": lambda: dm.example_node_settings(
            dm.dsp_dynamic_multi_neighbors()),
        "large": lambda: dm.large_urban(),
    }[args.variant]()
    state = dm.init_state(cfg, jax.random.key(0))
    p, n, pos, quat, t = next(iter(sim.generate_sequence(1, cfg, seed=0)))
    frame = dm.Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
                     jnp.asarray(quat), jnp.asarray(t))
    step = jax.jit(dm.make_step(cfg, admission_control=False),
                   donate_argnums=0)
    txt = step.lower(state, frame).compile().as_text()

    # map fusion call-site name -> called computation name
    wanted = {name for _, name, _ in rows}
    calls = {}
    for m in re.finditer(r"%?([\w.-]+) = [^\n]*? fusion\([^\n]*?calls=%?"
                         r"([\w.-]+)", txt):
        if m.group(1) in wanted:
            calls[m.group(1)] = m.group(2)
    # collect computation bodies
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.-]+)\s+\([^)]*\)\s*->", line)
        if m or line.startswith(("ENTRY", "HloModule")):
            cur = m.group(1) if m else None
        if cur is not None:
            comps.setdefault(cur, []).append(line)
    for _, name, _ in rows:
        body = comps.get(calls.get(name))
        if not body:
            continue
        print(f"\n==== {name} " + "=" * 40)
        # op-kind census plus the heavy rows
        kinds = collections.Counter()
        for ln in body:
            m = re.search(r"= \S+ ([a-z][\w-]+)\(", ln)
            if m:
                kinds[m.group(1)] += 1
        print("  ops:", dict(kinds.most_common(12)))
        for ln in body:
            if re.search(r"= \S+ (gather|scatter|sort|dot|reduce-window|"
                         r"dynamic-slice|dynamic-update-slice|cumsum|"
                         r"reduce|iota|transpose|concatenate)\(", ln):
                print("   ", ln.strip()[:240])


if __name__ == "__main__":
    main()
