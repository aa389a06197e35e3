"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the on-device path is exercised by bench/TPU runs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dspmap_tpu as dm
from dspmap_tpu.ops.sweep import sweep_reference
from dspmap_tpu.ops.pallas.sweep import sweep_pallas


def _cfg(**kw):
    base = dict(nx=16, ny=16, nz=8, max_input_points=128,
                mover_capacity=1024, pyramid_slot_capacity=16, max_clusters=4)
    base.update(kw)
    return dm.dsp_dynamic(**base)


def _populated(cfg, key=0, vz_zero=True):
    state = dm.init_state(cfg, jax.random.key(key), init_particle_num=2000,
                          init_weight=0.05)
    p = state.particles
    rng = np.random.default_rng(key)
    S, V = p.flags.shape
    p = dataclasses.replace(
        p,
        vx=jnp.asarray(rng.normal(0, 0.5, (S, V)), jnp.float32),
        vy=jnp.asarray(rng.normal(0, 0.5, (S, V)), jnp.float32),
        vz=jnp.zeros((S, V), jnp.float32) if vz_zero else p.vz,
    )
    return state, p


@pytest.mark.parametrize("model", ["constant_velocity", "static"])
def test_sweep_kernel_matches_reference(model):
    cfg = _cfg(motion_model=model, estimator_enabled=model != "static")
    state, p = _populated(cfg)
    if model == "static":
        zeros = jnp.zeros_like(p.vx)
        p = dataclasses.replace(p, vx=zeros, vy=zeros, vz=zeros)
    dt = jnp.float32(0.3)
    sensor = jnp.asarray([0.2, -0.1, 0.4], jnp.float32)
    quat = jnp.asarray([0.9689, 0.0, 0.0, 0.2474], jnp.float32)
    origin = jnp.asarray(state.origin)

    ref = sweep_reference(p, cfg, dt, origin, sensor, quat)
    got = sweep_pallas(p, cfg, dt, origin, sensor, quat, interpret=True)

    # The kernel may contract multiply-adds (FMA), so positions can differ by
    # 1 ulp, and a sub-ulp position shift can flip voxel/pyramid membership
    # exactly at a cell boundary.  Require float agreement to 1e-5 and <0.1%
    # boundary flips on the discrete fields.
    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        if name == "pyr":  # garbage where not in FOV
            m = np.asarray(ref.fov) & np.asarray(got.fov)
            a, b = a[m], b[m]
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
        else:
            frac = np.mean(a.astype(np.int64) != b.astype(np.int64))
            assert frac < 1e-3, (name, frac)


@pytest.mark.parametrize("safety,mode", [
    (2, "limit_xy"),   # n_vel=2: vz plane elided from the kernel I/O
    (5, "limit_xy"),
    (2, "free"),       # n_vel=3: all velocity planes carried
    (2, "static"),     # n_vel=0: every velocity plane elided
])
def test_occupancy_kernel_matches_xla(safety, mode):
    """The occupancy mega-kernel (ops/pallas/occupancy.py) is element-exact
    vs the XLA pool pass, including cull, newborn reset, systematic-resample
    copy placement and mass fold-back -- at both the x2 and the x5
    (dsp_static) slot safety factors and at every velocity-plane elision
    arm (the clamp-invariant planes skipped from kernel I/O).  Inputs
    conform to the pipeline's clamp invariant per mode, which is what the
    elision's exactness is defined over."""
    from dspmap_tpu.ops.occupancy import _pool_pass_xla
    from dspmap_tpu.ops.pallas.occupancy import occupancy_pool_pass

    kw = {}
    if mode == "free":
        kw.update(limit_motion_to_xy_plane=False)
    elif mode == "static":
        kw.update(motion_model="static", estimator_enabled=False)
    cfg = _cfg(voxel_slot_safety_factor=safety, **kw)
    rng = np.random.default_rng(safety)
    state = dm.init_state(cfg, jax.random.key(0))
    S, V = cfg.slots_per_voxel, cfg.voxel_num
    flags = np.zeros((S, V), np.int32)
    weights = np.zeros((S, V), np.float32)
    vx = np.zeros((S, V), np.float32)
    for c in rng.choice(V, size=300, replace=False):
        k = rng.integers(1, S + 1)
        slots = rng.choice(S, size=k, replace=False)
        flags[slots, c] = rng.choice([1, 1, 1, 3], size=k)
        weights[slots, c] = rng.uniform(0.0005, 1.0, size=k)
        vx[slots, c] = np.where(rng.random(k) < 0.3, 1.0, 0.0)
    vz = np.zeros((S, V), np.float32)
    if mode == "static":
        vx[:] = 0.0  # static-model invariant: all velocities zero
    elif mode == "free":
        vz = rng.normal(0, 0.4, (S, V)).astype(np.float32)
    p = dataclasses.replace(
        state.particles,
        flags=jnp.asarray(flags), weight=jnp.asarray(weights),
        vx=jnp.asarray(vx), vz=jnp.asarray(vz),
        px=jnp.asarray(rng.normal(0, 1, (S, V)), jnp.float32),
        t=jnp.asarray(rng.uniform(0, 5, (S, V)), jnp.float32),
    )
    ref, ws_r, n_old_r, vsum_r, static_r, moving_r = _pool_pass_xla(p, cfg)
    (fields, ws, n_old, vsum, static_c, moving,
     counters) = occupancy_pool_pass(p, cfg, interpret=True)
    # kernel-emitted stats counters match the mask-derived forms
    valid_in = flags != 0
    survivor = valid_in & (weights >= cfg.weight_cull_threshold)
    new_valid = np.asarray(ref.flags) != 0
    n_valid_v, n_culled_v, do_rs_v, n_dropped_v, n_filled_v = map(
        np.asarray, counters
    )
    assert n_valid_v.sum() == survivor.sum()
    assert n_culled_v.sum() == (valid_in & ~survivor).sum()
    assert do_rs_v.sum() == (
        survivor.sum(axis=0) >= cfg.resample_min_count
    ).sum()
    assert n_dropped_v.sum() == (survivor & ~new_valid).sum()
    assert n_filled_v.sum() == (~survivor & new_valid).sum()
    assert (n_valid_v - n_dropped_v + n_filled_v).sum() == new_valid.sum()
    np.testing.assert_array_equal(np.asarray(fields["flags"]),
                                  np.asarray(ref.flags))
    np.testing.assert_allclose(np.asarray(fields["weight"]),
                               np.asarray(ref.weight), rtol=1e-6, atol=1e-9)
    for f in ("px", "py", "pz", "vx", "vy", "vz", "t"):
        np.testing.assert_allclose(
            np.asarray(fields[f]), np.asarray(getattr(ref, f)),
            rtol=1e-6, err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(moving), np.asarray(moving_r))
    np.testing.assert_allclose(np.asarray(static_c), np.asarray(static_r),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(n_old).astype(np.int32),
                                  np.asarray(n_old_r).astype(np.int32))


@pytest.mark.parametrize(
    "scenario",
    ["no_resample", "multi_tile_mixed", "tail_tile", "no_resample_with_t"],
)
def test_occupancy_kernel_skip_branch(scenario):
    """The kernel's per-tile resample skip (``pl.when(any_rs)``): tiles whose
    voxels all hold < resample_min_count survivors take the cheap copy branch,
    which must be element-exact too -- including the t-plane copy when
    ``record_particle_time`` and the mixed case where some grid tiles resample
    and others skip (V > L), plus a non-multiple V whose tail tile must mask
    its padding lanes out of the ``any_rs`` reduce."""
    from dspmap_tpu.ops.occupancy import _pool_pass_xla
    from dspmap_tpu.ops.pallas.occupancy import occupancy_pool_pass

    kw = {}
    if scenario == "multi_tile_mixed":
        kw.update(nx=32, ny=32)  # V = 8192 -> 4 tiles at L = 2048
    elif scenario == "tail_tile":
        kw.update(nx=24)  # V = 3072 -> one full tile + a 1024 tail
    elif scenario == "no_resample_with_t":
        kw.update(record_particle_time=True)
    cfg = _cfg(**kw)
    S, V = cfg.slots_per_voxel, cfg.storage_voxels
    L = 2048 if S <= 32 else 1024
    rng = np.random.default_rng(3)
    flags = np.zeros((S, V), np.int32)
    weights = np.zeros((S, V), np.float32)
    vx = np.zeros((S, V), np.float32)
    resample_hi = min(V, L) if scenario in ("multi_tile_mixed", "tail_tile") else 0
    for c in rng.choice(V, size=min(300, V // 4), replace=False):
        if c < resample_hi:
            k = rng.integers(cfg.resample_min_count, S + 1)  # resampling voxel
        else:
            k = rng.integers(1, cfg.resample_min_count)  # below the threshold
        slots = rng.choice(S, size=k, replace=False)
        flags[slots, c] = rng.choice([1, 1, 1, 3], size=k)
        weights[slots, c] = rng.uniform(0.01, 1.0, size=k)
        vx[slots, c] = np.where(rng.random(k) < 0.3, 1.0, 0.0)
    # sanity: the populated pool exercises the intended branches
    survivors = ((flags != 0) & (weights >= cfg.weight_cull_threshold)).sum(0)
    if resample_hi:
        assert survivors[:resample_hi].max() >= cfg.resample_min_count
        assert survivors[resample_hi:].max() < cfg.resample_min_count
    else:
        assert survivors.max() < cfg.resample_min_count

    state = dm.init_state(cfg, jax.random.key(0))
    p = dataclasses.replace(
        state.particles,
        flags=jnp.asarray(flags), weight=jnp.asarray(weights),
        vx=jnp.asarray(vx),
        px=jnp.asarray(rng.normal(0, 1, (S, V)), jnp.float32),
        t=jnp.asarray(rng.uniform(0, 5, (S, V)), jnp.float32),
    )
    ref, ws_r, n_old_r, vsum_r, static_r, moving_r = _pool_pass_xla(p, cfg)
    (fields, ws, n_old, vsum, static_c, moving,
     _counters) = occupancy_pool_pass(p, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(fields["flags"]),
                                  np.asarray(ref.flags))
    np.testing.assert_allclose(np.asarray(fields["weight"]),
                               np.asarray(ref.weight), rtol=1e-6, atol=1e-9)
    for f in ("px", "py", "pz", "vx", "vy", "vz", "t"):
        np.testing.assert_allclose(
            np.asarray(fields[f]), np.asarray(getattr(ref, f)),
            rtol=1e-6, err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(moving), np.asarray(moving_r))


def test_update_pair_kernels_match_xla():
    """The measurement-update pair kernels (ops/pallas/update.py) match the
    XLA einsum formulation to f32 rounding (the kernels compute d2 as
    coordinate differences, the XLA path via the matmul identity)."""
    from dspmap_tpu.ops.pallas.update import update_pass1, update_pass2
    import math

    rng = np.random.default_rng(7)
    n_pyr, s_t, ck, sigma = 56, 32, 288, 0.1
    pos = rng.normal(0, 2, (n_pyr, s_t, 3)).astype(np.float32)
    w = (rng.random((n_pyr, s_t))
         * (rng.random((n_pyr, s_t)) > 0.3)).astype(np.float32)
    pts = rng.normal(0, 2, (n_pyr, ck, 3)).astype(np.float32)
    cinv = (rng.random((n_pyr, ck))
            * (rng.random((n_pyr, ck)) > 0.5)).astype(np.float32)

    c3 = (1.0 / math.sqrt(math.pi)) ** 3
    d2 = ((pos[:, :, None, :] / sigma - pts[:, None, :, :] / sigma) ** 2).sum(-1)
    g = c3 * np.exp(-0.5 * d2)
    want1 = np.einsum("psm,ps->pm", g, w)
    want2 = np.einsum("psm,pm->ps", g, cinv)

    got1 = np.asarray(update_pass1(jnp.asarray(pos), jnp.asarray(w),
                                   jnp.asarray(pts), sigma, interpret=True))
    got2 = np.asarray(update_pass2(jnp.asarray(pos), jnp.asarray(cinv),
                                   jnp.asarray(pts), sigma, interpret=True))
    np.testing.assert_allclose(got1, want1, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=1e-6)


def test_relayout_round_trip_interpret():
    """to_flat/from_flat == ravel/reshape (interpret mode; the TPU path is
    exercised by bench/large_urban)."""
    from dspmap_tpu.ops.pallas.relayout import from_flat, to_flat

    rng = np.random.default_rng(11)
    for S, V in [(18, 2048), (10, 1024), (60, 3072)]:
        plane = jnp.asarray(rng.normal(size=(S, V)).astype(np.float32))
        f = to_flat(plane, interpret=True)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(plane).ravel())
        r = from_flat(f, S, V, interpret=True)
        np.testing.assert_array_equal(np.asarray(r), np.asarray(plane))


def test_segscan_kernel_matches_xla_bit_exact():
    """ops/pallas/segscan.py: the segmented-scan kernel runs the identical
    Hillis-Steele recurrence -- bit-equal hi/tot vs the XLA helpers
    (interpret mode; fragmented runs + dead tail)."""
    import numpy as np
    import jax.numpy as jnp
    import dspmap_tpu.ops.pallas.segscan as sg
    from dspmap_tpu.ops.compact import _seg_cumsum, _fill_from_end

    old = sg.INTERPRET
    sg.INTERPRET = True
    try:
        rng = np.random.default_rng(3)
        P = 1024
        key = np.sort(rng.integers(0, 200, P))
        key[-100:] = 10**6
        # fragment a few runs (mid-frame disorder)
        key[100:110] = 7
        is_start = np.concatenate([[True], key[1:] != key[:-1]])
        is_end = np.concatenate([key[1:] != key[:-1], [True]]) & (key < 10**6)
        cols = [jnp.asarray(rng.uniform(0, 1, P), jnp.float32)
                for _ in range(3)]
        his_p, tots_p = sg.seg_scans_pallas(
            cols, jnp.asarray(is_start), jnp.asarray(is_end), 32, 2
        )
        X = jnp.stack(cols, -1)
        hi_x = _seg_cumsum(X, jnp.asarray(is_start), 32)
        tot_x = _fill_from_end(hi_x[:, :2], jnp.asarray(is_end), 32)
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(his_p[c]), np.asarray(hi_x[:, c])
            )
        m = key < 10**6
        for c in range(2):
            np.testing.assert_array_equal(
                np.asarray(tots_p[c])[m], np.asarray(tot_x[:, c])[m]
            )
    finally:
        sg.INTERPRET = old
