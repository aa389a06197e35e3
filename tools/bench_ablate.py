"""Quick ablation bench: flagship step with/without the admission-control
cond and the metrics reductions (structural-overhead probes)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_threefry_partitionable", True)

import dspmap_tpu as dm
from dspmap_tpu.utils import sim


def bench(cfg, with_metrics, admission, n_warm=3, n_bench=30):
    state = dm.init_state(cfg, jax.random.key(0))
    step = jax.jit(
        dm.make_step(cfg, with_metrics=with_metrics,
                     admission_control=admission),
        donate_argnums=0,
    )
    frames = [
        dm.Frame(jnp.asarray(p), jnp.int32(n), jnp.asarray(pos),
                 jnp.asarray(q), jnp.asarray(t))
        for p, n, pos, q, t in sim.generate_sequence(
            n_warm + n_bench, cfg, seed=0
        )
    ]
    for f in frames[:n_warm]:
        state, out = step(state, f)
    jax.block_until_ready(out)
    float(jnp.sum(out.weight_sum))
    t0 = time.perf_counter()
    for f in frames[n_warm:]:
        state, out = step(state, f)
    float(jnp.sum(out.weight_sum))
    dt = (time.perf_counter() - t0) / n_bench
    return dt * 1e3


def main():
    cfg = dm.example_node_settings(dm.dsp_dynamic())
    for wm, ac in [(True, True), (False, True), (True, False),
                   (False, False)]:
        ms = bench(cfg, wm, ac)
        print(f"with_metrics={wm} admission={ac}: {ms:.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
