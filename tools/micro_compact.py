"""Microbench compact_mask variants at pool size (row width, sort dtype)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax
import jax.numpy as jnp
from dspmap_tpu.ops.common import compact_mask

N = 18 * 174240  # flagship pool
CAP = 1 << 15


def variant(row, dtype):
    def f(mask):
        mask = mask.ravel()
        pad = (-mask.size) % row
        if pad:
            mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
        rows = mask.reshape(-1, row)
        n_rows = rows.shape[0]
        lane = jnp.broadcast_to(
            jnp.arange(row, dtype=dtype)[None, :], rows.shape)
        packed_lane = jnp.sort(jnp.where(rows, lane, dtype(row)), axis=1)
        counts = jnp.sum(rows, axis=1, dtype=jnp.int32)
        ends = jnp.cumsum(counts)
        n_selected = ends[-1]
        out_pos = jnp.arange(CAP, dtype=jnp.int32)
        row_of = jnp.searchsorted(ends, out_pos, side="right", method="sort")
        row_of = jnp.minimum(row_of, n_rows - 1).astype(jnp.int32)
        off = out_pos - (ends[row_of] - counts[row_of])
        src_lane = packed_lane.ravel()[
            row_of * row + jnp.minimum(off, row - 1)].astype(jnp.int32)
        idx = row_of * row + jnp.minimum(src_lane, row - 1)
        valid = out_pos < n_selected
        return jnp.where(valid, idx, 0), valid
    return f


def bench(fn, mask, tag):
    g = jax.jit(fn)
    r = g(mask); jax.block_until_ready(r)
    float(r[0][0])  # genuine sync
    n, reps = 0, 30
    t0 = time.perf_counter(); float(g(mask)[0][0]); sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [g(mask) for _ in range(reps)]
    float(outs[-1][0][0])
    dt = time.perf_counter() - t0 - sync
    print(f"{tag:28s} {dt/reps*1e3:7.3f} ms")


key = jax.random.key(0)
mask = jax.random.uniform(key, (N,)) < 0.008  # ~25k selected, clustered-ish
base = jax.jit(lambda m: compact_mask(m, CAP)[:2])
bench(lambda m: compact_mask(m, CAP)[:2], mask, "current (row=1024, i32)")
for row in (2048, 1024, 512, 256):
    for dt in (jnp.int32, jnp.uint16):
        bench(variant(row, dt), mask, f"row={row} dtype={dt.__name__}")
