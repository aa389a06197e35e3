"""Compact-layout core (ops/compact.py): equivalence with the pool layout,
capacity semantics, resample exactness and budget accounting.

The two layouts implement the identical per-voxel semantics (SURVEY.md
section 2.2) with one documented deviation -- in-voxel processing order
(compact-row vs slot order; the reference's own insert order is a third) --
so early frames from the same RNG stream match exactly until a resample
tie-break diverges, and all aggregate invariants hold throughout.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dspmap_tpu import (
    Frame,
    dsp_dynamic,
    dsp_static,
    example_node_settings,
    init_state,
    make_step,
)
from dspmap_tpu.utils import sim


def small_cfg(**kw):
    base = dict(
        nx=24, ny=24, nz=12,
        voxel_resolution=0.25,
        max_input_points=1024,
        mover_capacity=8192,
        pyramid_slot_capacity=96,
        max_clusters=16,
    )
    base.update(kw)
    return base


def _frames(cfg, n, seed=0, speed=0.5, gen=None):
    gen = gen or sim.generate_sequence
    return [
        Frame(jnp.asarray(p), jnp.int32(c), jnp.asarray(pos), jnp.asarray(q),
              jnp.asarray(t))
        for p, c, pos, q, t in gen(n, cfg, seed=seed, speed=speed)
    ]


def _run(cfg, frames):
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    outs = []
    for f in frames:
        state, out = step(state, f)
        outs.append(out)
    return state, outs


@pytest.mark.parametrize(
    "preset", [dsp_dynamic, dsp_static], ids=["dynamic", "static"]
)
def test_compact_matches_pool_before_first_resample_divergence(preset):
    """Same RNG stream, same semantics: the layouts agree exactly on alive /
    born / updated counts and per-voxel weight sums until the first
    resample-order tie-break, and stay within a tight band after."""
    cfg_p = example_node_settings(preset(**small_cfg()))
    cfg_c = dataclasses.replace(cfg_p, layout="compact")
    frames = _frames(cfg_p, 8)
    _, outs_p = _run(cfg_p, frames)
    _, outs_c = _run(cfg_c, frames)

    # frame 0 (pure birth): identical candidate tables -> identical births,
    # near-identical sums; resample of equal-weight newborns sits exactly ON
    # the systematic grid boundaries, so summation association (slot-order
    # cumsum vs segmented scan) flips a few drop decisions at the last ulp
    mp, mc = outs_p[0].metrics, outs_c[0].metrics
    assert int(mp["born"]) == int(mc["born"])
    np.testing.assert_allclose(
        np.asarray(outs_p[0].weight_sum), np.asarray(outs_c[0].weight_sum),
        rtol=1e-4, atol=1e-5,
    )
    assert abs(int(mp["alive"]) - int(mc["alive"])) <= 3
    # later frames: candidate-order re-association (different FOV tier
    # assignment order -> ~1e-7 C(z) rounding shifts) amplifies through
    # cull/resample thresholds -- the usual stochastic-filter chaos; hold a
    # distributional band instead of bitwise equality
    for i in range(1, 8):
        wp = float(jnp.sum(outs_p[i].weight_sum))
        wc = float(jnp.sum(outs_c[i].weight_sum))
        assert abs(wp - wc) <= 0.12 * max(wp, 1.0), (i, wp, wc)
        ap, ac = int(outs_p[i].metrics["alive"]), int(outs_c[i].metrics["alive"])
        assert abs(ap - ac) <= 0.12 * max(ap, 1), (i, ap, ac)


def test_compact_capacity_invariants():
    """Per-voxel occupancy never exceeds S and every live particle is inside
    the window (drop-on-full, dsp_dynamic.h:1198-1200,1227-1229)."""
    cfg = example_node_settings(
        dsp_dynamic(layout="compact", **small_cfg())
    )
    frames = _frames(cfg, 10)
    state, _ = _run(cfg, frames)
    p = state.particles
    alive = np.asarray(p.flags) != 0
    pos = np.stack([np.asarray(p.px), np.asarray(p.py), np.asarray(p.pz)],
                   axis=-1)[alive]
    from dspmap_tpu import geometry

    wv = np.floor(pos / cfg.voxel_resolution).astype(np.int64)
    origin = np.asarray(state.origin)
    rel = wv - origin
    dims = np.array([cfg.nx, cfg.ny, cfg.nz])
    assert ((rel >= 0) & (rel < dims)).all()
    cells = np.asarray(
        geometry.storage_index(jnp.asarray(wv, jnp.int32), cfg)
    )
    counts = np.bincount(cells, minlength=cfg.storage_voxels)
    assert counts.max() <= cfg.slots_per_voxel


def test_compact_occupancy_matches_pool_pass_exactly():
    """occupancy_compact vs the pool layout's _pool_pass_xla on the SAME
    population in the SAME in-voxel order: identical surviving weight
    multisets per voxel, identical per-voxel sums and counters (the
    resample walk is order-determined; matching the order makes the two
    formulations element-equivalent)."""
    from dspmap_tpu.ops.compact import occupancy_compact
    from dspmap_tpu.ops.occupancy import occupancy_and_resample
    from dspmap_tpu.state import Particles

    cfg = dsp_dynamic(
        nx=8, ny=8, nz=4, voxel_resolution=0.25, layout="compact",
        particle_capacity=1024, mover_capacity=256,
        use_pallas_occupancy=False,
    )
    S, Vs = cfg.slots_per_voxel, cfg.storage_voxels
    rng = np.random.default_rng(0)
    origin = jnp.asarray(np.array([0, 0, 0], np.int32))

    # population: a handful of voxels, some above the resample count
    n = 400
    cell = rng.integers(0, cfg.voxel_num, size=n)
    # in-window world position inside the chosen storage cell
    sx = cell % cfg.nx
    sy = (cell // cfg.nx) % cfg.ny
    sz = cell // (cfg.nx * cfg.ny)
    pos = (np.stack([sx, sy, sz], -1) + rng.uniform(0.1, 0.9, (n, 3))) * 0.25
    w = rng.uniform(0.0005, 0.3, n).astype(np.float32)  # some below cull
    vel = np.where(rng.uniform(size=(n, 1)) < 0.3,
                   rng.uniform(-1, 1, (n, 3)), 0.0).astype(np.float32)
    vel[:, 2] = 0.0

    # compact arrays, row order == insertion order
    P = cfg.compact_capacity
    z = np.zeros(P, np.float32)

    def col(x):
        out = z.copy()
        out[:n] = x
        return jnp.asarray(out)

    flags = np.zeros(P, np.int32)
    flags[:n] = 1
    flags[: n // 8] = 3  # some newborns
    pc = Particles(
        flags=jnp.asarray(flags),
        px=col(pos[:, 0]), py=col(pos[:, 1]), pz=col(pos[:, 2]),
        vx=col(vel[:, 0]), vy=col(vel[:, 1]), vz=col(vel[:, 2]),
        weight=col(w), t=jnp.asarray(z),
    )
    future0 = jnp.zeros((cfg.n_horizons, Vs), jnp.float32)
    new_c, ws_c, va_c, fut_c, st_c = occupancy_compact(pc, cfg, origin, future0)

    # pool arrays: same in-voxel order (slot = arrival rank within voxel)
    ranks = np.zeros(n, np.int64)
    seen = {}
    for i, c in enumerate(cell):
        ranks[i] = seen.get(c, 0)
        seen[c] = ranks[i] + 1
    assert ranks.max() < S

    def plane(x, dtype=np.float32):
        out = np.zeros((S, Vs), dtype)
        out[ranks, cell] = x
        return jnp.asarray(out)

    pp = Particles(
        flags=plane(flags[:n], np.int32),
        px=plane(pos[:, 0]), py=plane(pos[:, 1]), pz=plane(pos[:, 2]),
        vx=plane(vel[:, 0]), vy=plane(vel[:, 1]), vz=plane(vel[:, 2]),
        weight=plane(w), t=plane(np.zeros(n, np.float32)),
    )
    cfg_pool = dataclasses.replace(cfg, layout="pool")
    new_p, ws_p, va_p, fut_p, st_p = occupancy_and_resample(
        pp, cfg_pool, origin, future0
    )

    np.testing.assert_allclose(np.asarray(ws_c), np.asarray(ws_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(va_c), np.asarray(va_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fut_c), np.asarray(fut_p),
                               rtol=1e-5, atol=1e-6)
    for k in ("alive", "culled", "resampled_voxels"):
        assert int(st_c[k]) == int(st_p[k]), k
    # dropped/copies counters are gross in the compact path and net in the
    # pool path (a dropped slot refilled by a copy counts as neither there);
    # the net difference must agree.
    assert int(st_c["resample_copies"]) - int(st_c["resample_dropped"]) == (
        int(st_p["resample_copies"]) - int(st_p["resample_dropped"])
    )

    # surviving weight multiset per voxel identical
    def voxel_weights(p):
        f = np.asarray(p.flags).ravel()
        wgt = np.asarray(p.weight).ravel()
        if np.asarray(p.px).ndim == 2:
            cells = np.tile(np.arange(Vs), S)
        else:
            wv = np.floor(
                np.stack([np.asarray(p.px), np.asarray(p.py),
                          np.asarray(p.pz)], -1) / cfg.voxel_resolution
            ).astype(np.int64)
            cells = (
                (wv[:, 2] % cfg.nz) * cfg.ny + wv[:, 1] % cfg.ny
            ) * cfg.nx + wv[:, 0] % cfg.nx
        out = {}
        for c, ww, ff in zip(cells, wgt, f):
            if ff != 0:
                out.setdefault(int(c), []).append(round(float(ww), 6))
        return {k: sorted(v) for k, v in out.items()}

    assert voxel_weights(new_c) == voxel_weights(new_p)


def test_insert_compact_drop_on_full_and_budget():
    """Per-voxel drop-on-full is exact; the global row budget drops and
    counts the surplus (pool_overflow)."""
    from dspmap_tpu.ops.compact import insert_compact
    from dspmap_tpu.state import Particles

    cfg = dsp_dynamic(
        nx=8, ny=8, nz=4, voxel_resolution=0.25, layout="compact",
        particle_capacity=64,
    )
    S = cfg.slots_per_voxel
    P = cfg.compact_capacity
    z = jnp.zeros((P,), jnp.float32)
    empty = Particles(flags=jnp.zeros((P,), jnp.int32), px=z, py=z, pz=z,
                      vx=z, vy=z, vz=z, weight=z, t=z)
    origin = jnp.asarray(np.zeros(3, np.int32))
    count_v = jnp.zeros((cfg.storage_voxels,), jnp.float32)

    # 2*S candidates into ONE voxel -> exactly S insert
    m = 2 * S
    pos = jnp.tile(jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32), (m, 1))
    new, born, dropped = insert_compact(
        empty, cfg, pos=pos, vel=jnp.zeros((m, 3)), weight=jnp.ones((m,)),
        valid=jnp.ones((m,), bool), origin=origin, flag=1, t=None,
        count_v=count_v,
    )
    assert int(born) == S
    assert int(dropped) == 0  # capacity drops are not row-budget drops
    assert int(jnp.sum(new.flags != 0)) == S

    # row budget: candidates across many voxels exceed P=64 rows
    m = 200
    rngn = np.random.default_rng(1)
    pos = jnp.asarray(
        (rngn.permutation(np.arange(m))[:, None] * np.array([1, 0, 0])
         % np.array([8, 1, 1])) * 0.25
        + rngn.uniform(0.05, 0.2, (m, 3)),
        jnp.float32,
    )
    new, born, dropped = insert_compact(
        empty, cfg, pos=pos, vel=jnp.zeros((m, 3)), weight=jnp.ones((m,)),
        valid=jnp.ones((m,), bool), origin=origin, flag=1, t=None,
        count_v=count_v,
    )
    assert int(born) <= P
    assert int(born) + int(dropped) <= m
    assert int(jnp.sum(new.flags != 0)) == int(born)


def test_compact_pool_overflow_counted():
    """A tiny particle_capacity forces global-row overflow: counted, never
    crashing, per-voxel capacity still respected."""
    cfg = example_node_settings(
        dsp_dynamic(layout="compact", particle_capacity=256, **small_cfg())
    )
    frames = _frames(cfg, 6)
    state, outs = _run(cfg, frames)
    assert any(int(o.metrics["pool_overflow"]) > 0 for o in outs)
    assert all(int(o.metrics["alive"]) <= 256 for o in outs)


def test_compact_runtime_setters_no_recompile():
    """Live setters ride traced scalars in the compact layout too."""
    from dspmap_tpu.models.pipeline import set_observation_stddev

    cfg = example_node_settings(dsp_dynamic(layout="compact", **small_cfg()))
    frames = _frames(cfg, 3)
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_step(cfg))
    state, _ = step(state, frames[0])
    n0 = step._cache_size()
    state = set_observation_stddev(state, 0.25)
    state, out = step(state, frames[1])
    assert step._cache_size() == n0
    assert bool(out.accepted)
