import numpy as np
import jax.numpy as jnp

from imvoxelnet_tpu.ops import boxes as box_ops


def test_limit_period():
    vals = jnp.array([0.0, np.pi, -np.pi, 3.5, -3.5, 0.3])
    out = np.asarray(box_ops.limit_period(vals))
    # expected: val - floor(val/pi + 0.5) * pi
    exp = vals - np.floor(np.asarray(vals) / np.pi + 0.5) * np.pi
    np.testing.assert_allclose(out, exp, atol=1e-6)
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)


def test_rotation_3d_in_axis_z():
    # rotating the x unit vector by +pi/2 about z under the reference's
    # row-vector convention gives (0, -1, 0)
    pts = jnp.array([[[1.0, 0.0, 0.0]]])
    out = np.asarray(box_ops.rotation_3d_in_axis(pts, jnp.array([np.pi / 2]), axis=2))
    np.testing.assert_allclose(out[0, 0], [0.0, -1.0, 0.0], atol=1e-6)


def test_gravity_center_and_volume():
    b = jnp.array([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.3]])
    gc = np.asarray(box_ops.gravity_center(b))
    np.testing.assert_allclose(gc[0], [1.0, 2.0, 6.0])
    np.testing.assert_allclose(np.asarray(box_ops.volume(b))[0], 48.0)
    # round-trip bottom <-> gravity center
    rt = np.asarray(box_ops.to_bottom_center(box_ops.with_gravity_center(b)))
    np.testing.assert_allclose(rt, np.asarray(b), atol=1e-6)


def test_corners_axis_aligned():
    b = jnp.array([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]])
    c = np.asarray(box_ops.corners(b))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.min(0), [-1, -2, 0], atol=1e-6)
    np.testing.assert_allclose(c.max(0), [1, 2, 6], atol=1e-6)
    # reference corner order: first corner is (x0, y0, z0)
    np.testing.assert_allclose(c[0], [-1, -2, 0], atol=1e-6)
    np.testing.assert_allclose(c[6], [1, 2, 6], atol=1e-6)


def test_corners_rotated_consistent_with_bev_corners():
    b = jnp.array([[1.0, -2.0, 0.5, 2.0, 3.0, 1.0, 0.7]])
    c3d = np.asarray(box_ops.corners(b))[0]
    cbev = np.asarray(box_ops.bev_corners(box_ops.bev(b)))[0]
    # the xy of the bottom corners must match the BEV corner set
    bottom_xy = c3d[[0, 3, 4, 7], :2]
    for p in bottom_xy:
        d = np.min(np.linalg.norm(cbev - p, axis=1))
        assert d < 1e-5


def test_nearest_bev_swaps_extents():
    # yaw ~ pi/2 means dx/dy swap in the axis-aligned approximation
    b = jnp.array([
        [0.0, 0.0, 0.0, 2.0, 6.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 2.0, 6.0, 1.0, np.pi / 2],
    ])
    nb = np.asarray(box_ops.nearest_bev(b))
    np.testing.assert_allclose(nb[0], [-1, -3, 1, 3], atol=1e-6)
    np.testing.assert_allclose(nb[1], [-3, -1, 3, 1], atol=1e-5)


def test_xywhr2xyxyr():
    b = jnp.array([[1.0, 2.0, 4.0, 6.0, 0.3]])
    out = np.asarray(box_ops.xywhr2xyxyr(b))[0]
    np.testing.assert_allclose(out, [-1, -1, 3, 5, 0.3], atol=1e-6)


def test_points_cam2img():
    proj = jnp.array([
        [100.0, 0.0, 50.0, 0.0],
        [0.0, 100.0, 40.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    pts = jnp.array([[1.0, 2.0, 10.0]])
    uv = np.asarray(box_ops.points_cam2img(pts, proj))[0]
    np.testing.assert_allclose(uv, [100 * 1 / 10 + 50, 100 * 2 / 10 + 40], atol=1e-5)


def test_rotation_matches_reference_golden():
    """Golden point rotation from the reference's test_box3d.py (LiDAR
    rotate by 0.13603681...): our row-vector convention must reproduce it."""
    pts = jnp.asarray([[-1.0280, 0.9888, -1.4658],
                       [-4.3695, 2.1310, -1.3857],
                       [-6.5263, 1.5595, -0.9697],
                       [-0.4809, 0.7073, -0.5265],
                       [-4.5623, 0.7166, -1.4741]])[None]
    angle = jnp.asarray([0.13603681398218053])
    out = np.asarray(box_ops.rotation_3d_in_axis(pts, angle, axis=2))[0]
    expected = np.array([[-0.8844, 1.1191, -1.4658],
                         [-4.0401, 2.7039, -1.3857],
                         [-6.2545, 2.4302, -0.9697],
                         [-0.3805, 0.7660, -0.5265],
                         [-4.4230, 1.3287, -1.4741]])
    np.testing.assert_allclose(out, expected, atol=1e-3)
    # and the rotation matrix itself
    m = np.asarray(box_ops.rotation_matrix_2d(angle))[0]
    np.testing.assert_allclose(m, [[0.9908, -0.1356], [0.1356, 0.9908]],
                               atol=1e-3)


def test_in_range_bev_reference_semantics():
    """Strict-inequality BEV range check (reference expected [1,1,0,0,0]
    pattern from test_box3d.py's in_range cases)."""
    boxes = jnp.asarray([
        [5.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.1],
        [20.0, 10.0, 0.0, 2.0, 2.0, 2.0, 0.1],
        [-1.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.1],   # x below range
        [5.0, 45.0, 0.0, 2.0, 2.0, 2.0, 0.1],   # y above range
        [70.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.1],   # x above range
    ])
    out = np.asarray(box_ops.in_range_bev(boxes, (0, -40, 69.12, 40)))
    np.testing.assert_array_equal(out, [True, True, False, False, False])
    # boundary is exclusive (strict >)
    edge = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    assert not bool(box_ops.in_range_bev(edge, (0, -40, 69.12, 40))[0])
