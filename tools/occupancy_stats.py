"""Measure realized pyramid/FOV occupancy peaks on the synthetic street scene.

Sizes the measurement update's dense processing tier (ops/update.py): the
reference's per-pyramid particle capacity (SAFE_PARTICLE_NUM_PYRAMID, e.g. 462
for dsp_dynamic.h:64-66) is a kill threshold sized for worst-case global
density, but realized per-cell occupancy is far below it.  This script runs
each variant on the synthetic scene and records, per frame:

* peak particles in any single pyramid cell (and the 99.9th percentile),
* peak observation points in any pyramid cell,
* total in-FOV particle count.

Run: python tools/occupancy_stats.py [--frames N] [--cpu]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="dynamic,static,multi")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import dspmap_tpu as dm
    from dspmap_tpu import geometry
    from dspmap_tpu.utils import sim
    from dspmap_tpu.ops.project import project_points

    variants = {
        "dynamic": dm.example_node_settings(dm.dsp_dynamic()),
        "static": dm.example_node_settings(dm.dsp_static()),
        "multi": dm.example_node_settings(
            dm.dsp_dynamic_multi_neighbors(max_obs_points_per_pyramid=100)
        ),
    }

    @jax.jit
    def stats_fn(state, frame, cfg_static):
        pass

    for name in args.variants.split(","):
        cfg = variants[name]
        state = dm.init_state(cfg, jax.random.key(0))
        step = jax.jit(dm.make_step(cfg), donate_argnums=0)

        P_TIERS = (16, 32, 48, 64, 96, 128)
        O_TIERS = (8, 16, 24, 32, 48, 64)

        def frame_stats(particles, sensor_pos, quat, pts, n, cfg=cfg):
            # per-slot pyramid ids (same geometry as register_fov)
            Rm = geometry.rotation_matrix(geometry.quaternion_conjugate(quat))
            sx, sy, sz = geometry.rotate_planar(
                Rm,
                particles.px - sensor_pos[0],
                particles.py - sensor_pos[1],
                particles.pz - sensor_pos[2],
            )
            pyr, in_fov = geometry.pyramid_index_planar(sx, sy, sz, cfg)
            m = particles.valid & in_fov
            counts = (
                jnp.zeros((cfg.n_pyramids + 1,), jnp.int32)
                .at[jnp.where(m, pyr, cfg.n_pyramids)]
                .add(1, mode="drop")[: cfg.n_pyramids]
            )
            pv = jnp.arange(pts.shape[0], dtype=jnp.int32) < n
            obs = project_points(pts, pv, sensor_pos, quat, cfg)
            ocounts = obs.counts
            p_spill = [jnp.sum(jnp.maximum(counts - c, 0)) for c in P_TIERS]
            o_spill = [jnp.sum(jnp.maximum(ocounts - c, 0)) for c in O_TIERS]
            return (
                jnp.sum(m), jnp.max(counts), jnp.max(ocounts),
                jnp.stack(p_spill), jnp.stack(o_spill),
            )

        frame_stats = jax.jit(frame_stats)
        peak_pyr, peak_obs, peak_fov = 0, 0, 0
        pk_spill = np.zeros(len(P_TIERS), np.int64)
        ok_spill = np.zeros(len(O_TIERS), np.int64)
        for pts, n, pos, quat, t in sim.generate_sequence(args.frames, cfg, seed=0):
            f = dm.Frame(
                jnp.asarray(pts), jnp.int32(n), jnp.asarray(pos),
                jnp.asarray(quat), jnp.asarray(t),
            )
            nf, mx, omx, psp, osp = frame_stats(
                state.particles, f.sensor_pos, f.quat, f.points, f.n_points
            )
            state, out = step(state, f)
            peak_pyr = max(peak_pyr, int(mx))
            peak_obs = max(peak_obs, int(omx))
            peak_fov = max(peak_fov, int(nf))
            pk_spill = np.maximum(pk_spill, np.asarray(psp))
            ok_spill = np.maximum(ok_spill, np.asarray(osp))
        print(
            f"{name}: n_pyr={cfg.n_pyramids} s_pyr_ref={cfg.pyramid_slots} "
            f"K={cfg.max_obs_points_per_pyramid} | peak_cell={peak_pyr} "
            f"peak_obs_cell={peak_obs} peak_in_fov={peak_fov} "
            f"alive={int(out.metrics['alive'])}"
        )
        print(f"  particle spill (peak over frames): "
              + " ".join(f">{c}:{v}" for c, v in zip(P_TIERS, pk_spill)))
        print(f"  obs spill (peak over frames):      "
              + " ".join(f">{c}:{v}" for c, v in zip(O_TIERS, ok_spill)))


if __name__ == "__main__":
    main()
