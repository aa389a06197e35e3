"""Native preprocessing library: build, parity with the numpy fallbacks,
and sanity of the pose interpolation."""

import numpy as np
import pytest

from dspmap_tpu.io import native
from dspmap_tpu.io.rosbag import voxel_downsample


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_preprocess_frame_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    cam = rng.uniform([-3, -2, 0.3], [3, 2, 8.0], (4000, 3)).astype(np.float32)
    cam[5] = np.nan  # non-finite points must be dropped
    half = np.asarray([4.95, 4.95, 3.0], np.float32)

    out_c, n_c = native.preprocess_frame(cam, 0.1, half, 5000)

    ds = voxel_downsample(cam[np.isfinite(cam).all(axis=1)], 0.1)
    body = np.column_stack([ds[:, 2], -ds[:, 0], -ds[:, 1]])
    body = body[(np.abs(body) < half).all(axis=1)]

    assert n_c == len(body)
    # same point multiset (leaf enumeration order differs: hash map vs sort)
    a = np.sort(out_c[:n_c].round(4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]),
                order=("x", "y", "z"), axis=0)
    b = np.sort(np.ascontiguousarray(body).round(4).view(
        [("x", "f4"), ("y", "f4"), ("z", "f4")]), order=("x", "y", "z"), axis=0)
    np.testing.assert_allclose(
        a.view(np.float32).reshape(-1, 3), b.view(np.float32).reshape(-1, 3),
        atol=2e-4,
    )
    # padding is zeroed
    np.testing.assert_array_equal(out_c[n_c:], 0.0)


def test_interp_pose_slerp():
    times = np.asarray([0.0, 1.0])
    pos = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
    # yaw 0 -> yaw 90 deg
    quat = np.asarray([[1, 0, 0, 0],
                       [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]], np.float32)
    p, q = native.interp_pose(times, pos, quat, 0.5)
    np.testing.assert_allclose(p, [0.5, 0, 0], atol=1e-6)
    # halfway = yaw 45 deg
    np.testing.assert_allclose(
        q, [np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)], atol=1e-5)
    assert abs(np.linalg.norm(q) - 1.0) < 1e-6
    # clamped beyond the stream
    p2, _ = native.interp_pose(times, pos, quat, 5.0)
    np.testing.assert_allclose(p2, [1, 0, 0], atol=1e-6)
