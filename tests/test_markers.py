"""Marker observability surface (utils/markers.py): geometry and color
mapping match the reference node's display code
(map_sim_example.cpp:69-251,398-427)."""

import numpy as np

from dspmap_tpu.utils import markers as mk


def test_fov_marker_geometry():
    # identity attitude, the reference's own call: 90/54 deg, length 5
    pts = mk.fov_marker_points([1.0, 0, 0, 0], np.radians(90.0),
                               np.radians(54.0), 5.0)
    assert pts.shape == (10, 3)
    th, tv = np.tan(np.radians(45.0)), np.tan(np.radians(27.0))
    p1 = np.array([5.0, 5.0 * th, 5.0 * tv], np.float32)
    np.testing.assert_allclose(pts[0], p1, rtol=1e-6)
    # p2 mirrors x (the reference's verbatim corner, map_sim_example.cpp:140)
    np.testing.assert_allclose(pts[1], p1 * np.array([-1, 1, 1]), rtol=1e-6)
    # cam vertices at the origin in the strip (positions 2 and 5)
    np.testing.assert_array_equal(pts[2], 0.0)
    np.testing.assert_array_equal(pts[5], 0.0)


def test_fov_marker_rotates_with_attitude():
    yaw = np.radians(90.0)
    q = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
    pts = mk.fov_marker_points(q, np.radians(90.0), np.radians(54.0), 5.0)
    # +x rotates onto +y under a 90-degree yaw
    assert pts[0][1] > 4.9 and abs(pts[0][0] + pts[0][1] - pts[0][1]) < 5.1


def test_color_assign_matches_reference_sections():
    # v=min -> section 0, key 0 -> pure red; v=max -> 240 -> section 4 ->
    # sky blue (map_sim_example.cpp:221-250)
    np.testing.assert_array_equal(mk.color_assign(0.0), [255, 0, 0])
    np.testing.assert_array_equal(mk.color_assign(1.0), [0, 255, 255])
    # midpoints land in the right sections and stay monotone in hue
    rgb = mk.color_assign(np.linspace(0, 1, 241))
    assert rgb.shape == (241, 3)
    # reverse flips the ends
    np.testing.assert_array_equal(
        mk.color_assign(0.0, reverse_color=True), [0, 255, 255]
    )


def test_future_layer_cloud_offsets():
    V, T, nz = 4 * 4 * 4, 3, 4
    future = np.zeros((V, T), np.float32)
    centers = np.stack(np.meshgrid(*[np.arange(4)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)[
        :, ::-1
    ].astype(np.float32)
    pts, rgb = mk.future_layer_cloud(future, centers, nz, x_offset_step=12.0)
    per_layer = V // nz
    assert pts.shape == (per_layer * T, 3) and rgb.shape == pts.shape
    # horizon n is offset by 12*n in x
    np.testing.assert_allclose(
        pts[per_layer: 2 * per_layer, 0] - pts[:per_layer, 0], 12.0
    )


def test_cluster_velocity_arrows():
    points = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.float32)
    vel = np.array([[1, 0, 0], [-1000, -1000, -1000], [0, 0.5, 0]],
                   np.float32)
    dynamic = np.array([True, True, True])
    valid = np.array([True, True, True])
    arrows = mk.cluster_velocity_arrows((points, vel, dynamic, valid))
    # unknown-velocity point (sentinel) excluded
    assert arrows.shape == (2, 2, 3)
    np.testing.assert_allclose(arrows[0, 1], [1, 0, 0])


def test_actor_markers_reference_defaults():
    ms = mk.actor_markers(np.array([[1.0, 2.0, 0.85]]))
    assert ms[0]["type"] == "cylinder"
    np.testing.assert_allclose(ms[0]["scale"], [0.4, 0.4, 1.7])


def test_ros_bridges_gate_cleanly_without_ros():
    """Both live bridges are optional-dependency gated: importing the
    module works anywhere; constructing the node without a sourced ROS
    environment raises ImportError pointing at the offline path."""
    import pytest

    from dspmap_tpu.io import ros2_bridge, ros_bridge

    for mod, exc_fn in ((ros_bridge, ros_bridge._require_rospy),
                        (ros2_bridge, ros2_bridge._require_rclpy)):
        try:
            exc_fn()
        except ImportError as e:
            assert "offline" in str(e)
        else:  # pragma: no cover - only in a sourced ROS env
            pytest.skip("ROS environment present")
