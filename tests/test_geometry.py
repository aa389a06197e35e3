"""Property tests: closed-form pyramid indexing vs a direct implementation of
the reference's boundary-plane sign scan (dsp_dynamic.h:1329-1367), and the
toroidal voxel addressing invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from dspmap_tpu import dsp_dynamic, dsp_dynamic_multi_neighbors
from dspmap_tpu import geometry


def _plane_scan_oracle(pts, cfg):
    """The reference's plane-sign membership + scan (vectorized test oracle).

    Builds the same boundary-plane normals as setInitParameters
    (dsp_dynamic.h:563-578) and finds the first sign change like
    findPointPyramidHorizontal/VerticalIndex (dsp_dynamic.h:1341-1367).
    Returns (flat_index, in_fov) with flat_index -1 where out of FOV.
    """
    res = np.radians(float(cfg.angle_resolution_deg))
    nh, nv = cfg.n_pyramids_h, cfg.n_pyramids_v
    h_seq = np.arange(-nh // 2, nh // 2 + 1)
    v_seq = np.arange(-nv // 2, nv // 2 + 1)
    norm_h = np.stack(
        [-np.sin(h_seq * res), np.cos(h_seq * res), np.zeros_like(h_seq, float)], -1
    )
    norm_v = np.stack(
        [np.sin(v_seq * res), np.zeros_like(v_seq, float), np.cos(v_seq * res)], -1
    )
    dh = pts @ norm_h.T  # [N, nh+1]
    dv = pts @ norm_v.T  # [N, nv+1]
    in_area = (dh[:, 0] >= 0) & (dh[:, -1] <= 0) & (dv[:, 0] <= 0) & (dv[:, -1] >= 0)
    # scan semantics: last starts at +1 (h) / -1 (v); cell i fires when
    # last * dot[i+1] <= 0
    last_h = np.concatenate([np.ones((pts.shape[0], 1)), dh[:, 1:-1]], axis=1)
    fired_h = last_h * dh[:, 1:] <= 0
    h = np.argmax(fired_h, axis=1)
    last_v = np.concatenate([-np.ones((pts.shape[0], 1)), dv[:, 1:-1]], axis=1)
    fired_v = last_v * dv[:, 1:] <= 0
    v = np.argmax(fired_v, axis=1)
    ok = in_area & fired_h.any(axis=1) & fired_v.any(axis=1)
    return np.where(ok, h * nv + v, -1), ok


@pytest.mark.parametrize("cfg", [dsp_dynamic(), dsp_dynamic_multi_neighbors()])
def test_pyramid_index_matches_plane_scan(cfg):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, size=(4000, 3))
    flat, in_fov = geometry.pyramid_index(jnp.asarray(pts, jnp.float32), cfg)
    flat, in_fov = np.asarray(flat), np.asarray(in_fov)
    oracle, oracle_ok = _plane_scan_oracle(pts, cfg)
    # skip numerically boundary-ambiguous points
    az = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    el = np.degrees(np.arctan2(pts[:, 2], pts[:, 0]))
    amod = np.abs(az) % cfg.angle_resolution_deg
    emod = np.abs(el) % cfg.angle_resolution_deg
    clear = (
        (np.minimum(amod, cfg.angle_resolution_deg - amod) > 0.01)
        & (np.minimum(emod, cfg.angle_resolution_deg - emod) > 0.01)
    )
    np.testing.assert_array_equal(in_fov[clear], oracle_ok[clear])
    sel = clear & oracle_ok
    np.testing.assert_array_equal(flat[sel], oracle[sel])
    assert sel.sum() > 50


def test_quaternion_rotation_matches_matrix():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(100, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    got = np.asarray(geometry.quaternion_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v)))
    for i in range(100):
        w, x, y, z = q[i]
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(got[i], R @ v[i], rtol=1e-4, atol=1e-5)


def test_toroidal_addressing_roundtrip():
    cfg = dsp_dynamic()
    rng = np.random.default_rng(2)
    sensor = jnp.asarray([3.7, -1.2, 0.9], jnp.float32)
    origin = geometry.window_origin(sensor, cfg)
    wv_all = geometry.storage_to_world_voxel(origin, cfg)
    # every storage cell's world voxel is inside the window and maps back
    assert bool(jnp.all(geometry.in_window(wv_all, origin, cfg)))
    back = geometry.storage_index(wv_all, cfg)
    np.testing.assert_array_equal(np.asarray(back), np.arange(cfg.voxel_num))

    # random in-window points: index -> world voxel consistency
    half = np.asarray(cfg.half_extent)
    pts = jnp.asarray(
        np.asarray(sensor) + rng.uniform(-0.95, 0.95, (1000, 3)) * half, jnp.float32
    )
    wv = geometry.world_voxel(pts, cfg)
    inside = geometry.in_window(wv, origin, cfg)
    si = geometry.storage_index(wv, cfg)
    wv_back = wv_all[si]
    ok = np.asarray(inside)
    np.testing.assert_array_equal(
        np.asarray(wv)[ok], np.asarray(wv_back)[ok]
    )


def test_window_tracks_sensor():
    cfg = dsp_dynamic()
    # a static world point stays in the same storage cell as the sensor moves
    p = jnp.asarray([[1.0, 2.0, 0.5]], jnp.float32)
    cells = []
    for sx in np.linspace(0, 2, 7):
        origin = geometry.window_origin(jnp.asarray([sx, 2.0, 0.5], jnp.float32), cfg)
        wv = geometry.world_voxel(p, cfg)
        assert bool(geometry.in_window(wv, origin, cfg)[0])
        cells.append(int(geometry.storage_index(wv, cfg)[0]))
    assert len(set(cells)) == 1
