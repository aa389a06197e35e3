"""Round-2 primitive microbenchmarks (two-tier update building blocks).

Validates on the real TPU, before committing to the design:
* row gathers (contiguous minor-dim slices) at the spill-path sizes,
* one-hot matmul reductions (spill -> grid),
* u32-bitpack masked compaction vs the row-sort hierarchical compaction,
* bitmask empty-slot ranking vs the slot-axis sort in ops/insert.py.

Timing per docs/PERF.md methodology: N dispatches between two genuine
device->host syncs, sync floor subtracted.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].addressable_data(0)  # warm
    float(jnp.sum(jax.tree.leaves(fn(*args))[0]))  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # sync
    dt = time.perf_counter() - t0
    # sync floor
    t1 = time.perf_counter()
    float(jnp.sum(jax.tree.leaves(out)[0]))
    floor = time.perf_counter() - t1
    return (dt - floor) / n * 1e3


def main():
    key = jax.random.key(0)
    print(f"device: {jax.devices()[0].device_kind}")

    # --- row gather: [Osp*C, S_t*4] rows from dense tiles ---------------
    tiles = jax.random.normal(key, (448, 64 * 4))
    rows = jax.random.randint(key, (2048 * 9,), 0, 448)

    @jax.jit
    def row_gather(t, r):
        return t[r]

    print(f"row gather [18k rows of 256 f32] from [448,256]: "
          f"{timeit(row_gather, tiles, rows):.3f} ms")

    big = jax.random.normal(key, (448, 900 * 4))
    rows2 = jax.random.randint(key, (4096,), 0, 448)
    print(f"row gather [4096 rows of 3600 f32] from [448,3600]: "
          f"{timeit(row_gather, big, rows2):.3f} ms")

    # --- one-hot matmul reduction [n_pyr, Psp] @ [Psp, CK] --------------
    vals = jax.random.normal(key, (4096, 900))
    ids = jax.random.randint(key, (4096,), 0, 448)

    @jax.jit
    def onehot_reduce(v, i):
        oh = (i[None, :] == jnp.arange(448)[:, None]).astype(jnp.float32)
        return oh @ v

    print(f"one-hot reduce [448,4096]@[4096,900]: "
          f"{timeit(onehot_reduce, vals, ids):.3f} ms")

    vals2 = jax.random.normal(key, (18432, 64))
    ids2 = jax.random.randint(key, (18432,), 0, 448)

    @jax.jit
    def onehot_reduce2(v, i):
        oh = (i[None, :] == jnp.arange(448)[:, None]).astype(jnp.float32)
        return oh @ v

    print(f"one-hot reduce [448,18432]@[18432,64]: "
          f"{timeit(onehot_reduce2, vals2, ids2):.3f} ms")

    # --- compaction: u32 bitpack vs hierarchical row-sort ----------------
    from dspmap_tpu.ops.common import compact_mask

    mask = jax.random.bernoulli(key, 0.005, (18 * 174240,))

    @jax.jit
    def compact_old(m):
        return compact_mask(m, 1 << 15)[0]

    print(f"compact_mask row-sort [3.1M -> 32k]: "
          f"{timeit(compact_old, mask):.3f} ms")

    def compact_bits(m, capacity):
        n = m.size
        mb = m.reshape(-1, 32)
        weights = (1 << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
        packed = jnp.sum(
            jnp.where(mb, weights[None, :], jnp.uint32(0)), axis=1,
            dtype=jnp.uint32,
        )  # [n/32]
        counts = jax.lax.population_count(packed).astype(jnp.int32)
        ends = jnp.cumsum(counts)
        out_pos = jnp.arange(capacity, dtype=jnp.int32)
        word = jnp.searchsorted(ends, out_pos, side="right", method="sort")
        word = jnp.minimum(word, packed.size - 1).astype(jnp.int32)
        r = out_pos - (ends[word] - counts[word])  # rank within word
        w = packed[word]
        # select the r-th set bit of w via 32-step sweep
        prefix = jnp.zeros_like(r)
        lane = jnp.zeros_like(r)
        for b in range(32):
            bit = ((w >> b) & 1).astype(jnp.int32)
            hit = (bit == 1) & (prefix == r)
            lane = jnp.where(hit, b, lane)
            prefix = prefix + bit
        valid = out_pos < ends[-1]
        return jnp.where(valid, word * 32 + lane, 0), valid, ends[-1]

    cb = jax.jit(lambda m: compact_bits(m, 1 << 15)[0])
    print(f"compact bitpack [3.1M -> 32k]: {timeit(cb, mask):.3f} ms")
    # correctness
    a = np.asarray(compact_old(mask))
    b, v, nsel = jax.jit(lambda m: compact_bits(m, 1 << 15))(mask)
    nsel = int(nsel)
    assert np.array_equal(a[:nsel], np.asarray(b)[:nsel]), "bitpack mismatch"
    print(f"  bitpack correctness ok (n={nsel})")

    # --- empty-slot ranking: slot-sort vs bitmask ------------------------
    occ = jax.random.bernoulli(key, 0.1, (18, 174240))
    cand_cell = jax.random.randint(key, (1 << 14,), 0, 174240)
    cand_rank = jax.random.randint(key, (1 << 14,), 0, 4)

    @jax.jit
    def slot_sort(o, cell, rank):
        S = o.shape[0]
        slot_ids = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[:, None], o.shape
        )
        empty_order = jnp.sort(jnp.where(o, slot_ids + S, slot_ids), axis=0) % S
        return empty_order[jnp.minimum(rank, S - 1), cell]

    print(f"insert slot-sort [18,174k] + gather: "
          f"{timeit(slot_sort, occ, cand_cell, cand_rank):.3f} ms")

    @jax.jit
    def bitmask_rank(o, cell, rank):
        S = o.shape[0]
        weights = (1 << jnp.arange(S, dtype=jnp.uint32)).astype(jnp.uint32)
        packed = jnp.sum(
            jnp.where(o, weights[:, None], jnp.uint32(0)), axis=0,
            dtype=jnp.uint32,
        )  # [V] occupied-bitmask
        w = ~packed[cell]  # empty-bitmask per candidate
        prefix = jnp.zeros_like(rank)
        lane = jnp.full_like(rank, S)
        for b in range(S):
            bit = ((w >> b) & 1).astype(jnp.int32)
            hit = (bit == 1) & (prefix == rank)
            lane = jnp.where(hit, b, lane)
            prefix = prefix + bit
        return lane

    print(f"insert bitmask-rank [174k pack + 16k cand]: "
          f"{timeit(bitmask_rank, occ, cand_cell, cand_rank):.3f} ms")
    a = np.asarray(slot_sort(occ, cand_cell, cand_rank))
    b = np.asarray(bitmask_rank(occ, cand_cell, cand_rank))
    # slot_sort wraps occupied entries via %S when rank >= n_empty; only
    # compare where the bitmask path returns a real empty slot
    m = b < 18
    assert np.array_equal(a[m], b[m]), "bitmask rank mismatch"
    print(f"  bitmask correctness ok ({int(m.sum())}/{m.size} in-capacity)")

    # --- masked cross block [Psp, Osp] ----------------------------------
    pp = jax.random.normal(key, (4096, 3))
    oo = jax.random.normal(key, (2048, 3))

    @jax.jit
    def cross(p, o):
        d2 = (
            jnp.sum(p * p, -1)[:, None]
            + jnp.sum(o * o, -1)[None, :]
            - 2.0 * p @ o.T
        )
        return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))

    print(f"cross pair block [4096,2048] exp: {timeit(cross, pp, oo):.3f} ms")


if __name__ == "__main__":
    main()
