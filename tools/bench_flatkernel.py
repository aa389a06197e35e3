"""Micro-benchmark: streaming FLAT pool planes through a Pallas kernel with
manual per-row DMAs (the ops/pallas/relayout.py pattern, generalized to all
S rows of P planes per voxel chunk) vs the status-quo tiled round trip
(reshape pair).

This de-risks the flat-forever occupancy kernel: its cost is dominated by
(#planes x S x V/L) row-piece DMAs; if this skeleton cannot beat the 2x
reshape relayout, the kernel redesign is dead on arrival.

Two earlier formulations, measured and discarded:
* per-row (L,) BlockSpec blocks over a (nj, 2, S) grid: 48.8 ms -- per-step
  pipeline overhead at 2k+ steps dwarfs the traffic;
* the same with dynamic-offset VMEM vector stores: 3664 ms -- Mosaic lowers
  dynamic-offset vector stores catastrophically (use static offsets or DMA).
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 8  # planes


def _kernel(*refs, S, V, L, nj):
    """grid (nj + 1,): software-pipelined j-loop.

    step j: wait input DMAs for chunk j (issued at step j-1), issue input
    DMAs for chunk j+1, compute chunk j into out scratch, issue output DMAs
    for chunk j (waiting on chunk j-2's output DMAs before reusing the
    slot)."""
    ins = refs[:P]  # HBM flat [S*V]
    outs = refs[P:2 * P]  # HBM flat [S*V]
    agg = refs[2 * P]  # HBM [V]
    scr_in = refs[2 * P + 1]  # VMEM [2 * P * S * L]
    scr_out = refs[2 * P + 2]  # VMEM [2 * P * S * L]
    scr_agg = refs[2 * P + 3]  # VMEM [2 * L]
    sem_in = refs[2 * P + 4]  # DMA sems [2, P] (shared by the S row copies)
    sem_out = refs[2 * P + 5]  # [2, P]
    sem_agg = refs[2 * P + 6]  # [2]
    j = pl.program_id(0)
    total = pl.num_programs(0)  # nj + 1

    def in_copy(chunk, slot, p, s):
        return pltpu.make_async_copy(
            ins[p].at[pl.ds(s * V + chunk * L, L)],
            scr_in.at[pl.ds(((slot * P + p) * S + s) * L, L)],
            sem_in.at[slot, p],
        )

    def out_copy(chunk, slot, p, s):
        return pltpu.make_async_copy(
            scr_out.at[pl.ds(((slot * P + p) * S + s) * L, L)],
            outs[p].at[pl.ds(s * V + chunk * L, L)],
            sem_out.at[slot, p],
        )

    @pl.when(j == 0)
    def _first():
        for p in range(P):
            for s in range(S):
                in_copy(0, 0, p, s).start()

    @pl.when(j + 1 < total - 1 + 1)  # j+1 <= nj-1  <=>  j < nj
    def _issue_next():
        @pl.when(j + 1 < total - 1)
        def _():
            for p in range(P):
                for s in range(S):
                    in_copy(j + 1, (j + 1) % 2, p, s).start()

    @pl.when(j < total - 1)
    def _work():
        slot = j % 2
        # wait for this chunk's input DMAs
        for p in range(P):
            for s in range(S):
                in_copy(j, slot, p, s).wait()
        # wait for the output DMAs still flying on this slot (chunk j-2)
        @pl.when(j >= 2)
        def _():
            for p in range(P):
                for s in range(S):
                    out_copy(j, slot, p, s).wait()
            pltpu.make_async_copy(
                scr_agg.at[pl.ds(slot * L, L)],
                scr_agg.at[pl.ds(slot * L, L)],
                sem_agg.at[slot],
            ).wait()

        # compute: stand-in math (per-voxel slot sum + passthrough+1)
        for sl in range(2):
            @pl.when(slot == sl)
            def _(sl=sl):
                acc = jnp.zeros((L,), jnp.float32)
                for p in range(P):
                    for s in range(S):
                        off = ((sl * P + p) * S + s) * L
                        row = scr_in[pl.ds(off, L)]
                        if p == 0:
                            acc = acc + row
                        scr_out[pl.ds(off, L)] = row + 1.0
                scr_agg[pl.ds(sl * L, L)] = acc

        # issue output DMAs for chunk j
        for p in range(P):
            for s in range(S):
                out_copy(j, slot, p, s).start()
        pltpu.make_async_copy(
            scr_agg.at[pl.ds(slot * L, L)],
            agg.at[pl.ds(j * L, L)],
            sem_agg.at[slot],
        ).start()

    @pl.when(j == total - 1)
    def _drain():
        for sl in range(2):
            @pl.when((total - 1 - 2 + sl >= 0))
            def _(sl=sl):
                chunk = total - 1 - 2 + sl
                slot = chunk % 2
                for p in range(P):
                    for s in range(S):
                        out_copy(chunk, slot, p, s).wait()
                pltpu.make_async_copy(
                    scr_agg.at[pl.ds(slot * L, L)],
                    scr_agg.at[pl.ds(slot * L, L)],
                    sem_agg.at[slot],
                ).wait()


@functools.partial(jax.jit, static_argnames=("S", "V", "L"))
def flat_stream(planes, S, V, L):
    nj = V // L
    return pl.pallas_call(
        functools.partial(_kernel, S=S, V=V, L=L, nj=nj),
        grid=(nj + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * P,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (P + 1),
        out_shape=[jax.ShapeDtypeStruct((S * V,), jnp.float32)] * P
        + [jax.ShapeDtypeStruct((V,), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2 * P * S * L,), jnp.float32),
            pltpu.VMEM((2 * P * S * L,), jnp.float32),
            pltpu.VMEM((2 * L,), jnp.float32),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*planes)


@functools.partial(jax.jit, static_argnames=("S", "V"))
def reshape_roundtrip(planes, S, V):
    tiled = [p.reshape(S, V) for p in planes]
    outs = [(t + 1.0).reshape(-1) for t in tiled]
    agg = jnp.sum(tiled[0], axis=0)
    return outs + [agg]


def timeit(fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = fn()
    jax.block_until_ready(o)
    float(jax.tree.leaves(o)[0][0])  # genuine sync
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=18)
    ap.add_argument("--V", type=int, default=175104)
    ap.add_argument("--L", type=int, default=9216)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    S, V, L = args.S, args.V, args.L
    assert V % L == 0
    key = jax.random.key(0)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (S * V,),
                                jnp.float32) for i in range(P)]
    planes = jax.device_put(planes)

    a = flat_stream(planes, S, V, L)
    b = reshape_roundtrip(planes, S, V)
    ok = True
    for i, (x, y) in enumerate(zip(a, b)):
        if not jnp.array_equal(x, y):
            n_bad = int(jnp.sum(x != y))
            print(f"output {i}: {n_bad}/{x.size} mismatched")
            ok = False
    print("outputs match" if ok else "MISMATCH")
    if args.check_only:
        return

    ms_flat = timeit(lambda: flat_stream(planes, S, V, L))
    ms_resh = timeit(lambda: reshape_roundtrip(planes, S, V))
    traffic = P * S * V * 4 * 2 / 1e9  # read+write GB
    print(f"S={S} V={V} L={L} nj={V // L} dmas={P * S * (V // L) * 2}")
    print(f"flat_stream      {ms_flat:8.3f} ms  ({traffic / ms_flat * 1e3:.0f} GB/s)")
    print(f"reshape_roundtrip{ms_resh:8.3f} ms  ({traffic / ms_resh * 1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
