"""Replay harness: the ROS-free equivalent of the reference example node
(``src/map_sim_example.cpp``): feed a frame stream (synthetic scene, saved
``.npz`` sequence, or a converted rosbag) through the map and report
occupancy, future status and timing.

CLI::

    python -m dspmap_tpu.io.replay --frames 40 --variant dynamic
    python -m dspmap_tpu.io.replay --npz frames.npz --out outputs.npz
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def load_npz_frames(path):
    """Frame stream from an ``.npz`` with arrays points[N,P,3], n_points[N],
    sensor_pos[N,3], quat[N,4], timestamps[N]."""
    data = np.load(path)
    for i in range(len(data["timestamps"])):
        yield (
            data["points"][i],
            int(data["n_points"][i]),
            data["sensor_pos"][i],
            data["quat"][i],
            float(data["timestamps"][i]),
        )


def save_npz_frames(path, frames) -> None:
    pts, ns, poss, quats, ts = zip(*frames)
    np.savez_compressed(
        path,
        points=np.asarray(pts, np.float32),
        n_points=np.asarray(ns, np.int32),
        sensor_pos=np.asarray(poss, np.float32),
        quat=np.asarray(quats, np.float32),
        timestamps=np.asarray(ts, np.float64),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--variant", default="dynamic",
                    choices=["dynamic", "static", "multi"])
    ap.add_argument("--npz", help="frame stream .npz instead of synthetic")
    ap.add_argument("--out", help="write per-frame outputs to this .npz")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tiny", action="store_true",
                    help="16x16x8 smoke-test map (fast compile; CI use)")
    ap.add_argument("--csv", help="dump final particle CSV here")
    ap.add_argument("--checkpoint", help="save final state here (.npz)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import dspmap_tpu as dm
    from dspmap_tpu.utils import sim

    preset = {
        "dynamic": dm.dsp_dynamic,
        "static": dm.dsp_static,
        "multi": dm.dsp_dynamic_multi_neighbors,
    }[args.variant]
    # 9.6x9.6x4.8 m at coarse 0.6 m voxels: big enough that the synthetic
    # street scene's pillars and pedestrians (x in [3, 8]) fall inside the
    # map, small enough (16x16x8 grid) that a CPU compile finishes in
    # minutes rather than the full config's ~5 min.
    tiny = dict(
        nx=16, ny=16, nz=8, voxel_resolution=0.6, max_input_points=256,
        mover_capacity=2048, pyramid_slot_capacity=32, max_clusters=8,
    ) if args.tiny else {}
    cfg = dm.example_node_settings(preset(**tiny))
    state = dm.init_state(cfg, jax.random.key(0))
    step = jax.jit(dm.make_step(cfg))

    if args.npz:
        frames = load_npz_frames(args.npz)
    else:
        frames = sim.generate_sequence(args.frames, cfg, seed=0)

    walls, outputs = [], []
    for i, (pts, n, pos, quat, t) in enumerate(frames):
        frame = dm.Frame(
            jnp.asarray(pts, jnp.float32), jnp.int32(n),
            jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32),
            jnp.asarray(np.float32(t)),
        )
        t0 = time.perf_counter()
        state, out = step(state, frame)
        jax.block_until_ready(out.weight_sum)
        wall = time.perf_counter() - t0
        walls.append(wall)

        occ, centers, future, state = dm.get_occupancy_map(
            state, cfg, args.threshold
        )
        if args.out:
            occ_np = np.asarray(occ)
            outputs.append(
                {
                    "occupied_centers": np.asarray(centers)[occ_np],
                    "n_occupied": int(occ_np.sum()),
                }
            )
        print(
            f"frame {i:03d}: {wall*1e3:7.2f} ms  occupied={int(np.asarray(occ).sum()):5d}"
            f"  alive={int(out.metrics['alive'])}"
        )

    walls = np.asarray(walls[3:]) if len(walls) > 6 else np.asarray(walls)
    print(
        json.dumps(
            {
                "mean_ms": round(float(walls.mean() * 1e3), 2),
                "p50_ms": round(float(np.median(walls) * 1e3), 2),
                "updates_per_sec": round(1.0 / float(walls.mean()), 1),
            }
        )
    )
    if args.out:
        np.savez_compressed(
            args.out,
            n_occupied=np.asarray([o["n_occupied"] for o in outputs]),
            **{
                f"centers_{i}": o["occupied_centers"]
                for i, o in enumerate(outputs)
            },
        )
    if args.csv:
        from .particles_csv import export_particles_csv
        n = export_particles_csv(state, cfg, args.csv)
        print(f"wrote {n} particles to {args.csv}")
    if args.checkpoint:
        from .checkpoint import save_state
        save_state(state, args.checkpoint)
        print(f"checkpointed state to {args.checkpoint}")


if __name__ == "__main__":
    main()
