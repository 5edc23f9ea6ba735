"""Reference-derived geometry golden tests (VERDICT round-1 item 4).

Every expected tensor below is a literal constant lifted from the reference's
own test suite (``/root/reference/tests/test_box3d.py``) — the hard-won
conventions (yaw sign per mode, corner order, flip semantics, size
permutations in Box3DMode conversions) are pinned by reference data, not by
self-consistency.  Line references name the reference assertions each
constant came from.
"""

import numpy as np
import jax.numpy as jnp

from imvoxelnet_tpu.core import box_modes
from imvoxelnet_tpu.ops import boxes as box_ops
from imvoxelnet_tpu.ops import iou as iou_ops

# The canonical 5-box LiDAR set used throughout the reference tests
# (test_box3d.py:140-185).
LIDAR_BOXES = np.array(
    [[1.7802081, 2.516249, -1.7501148, 1.75, 3.39, 1.65, 1.48],
     [8.959413, 2.4567227, -1.6357126, 1.54, 4.01, 1.57, 1.62],
     [28.2967, -0.5557558, -1.303325, 1.47, 2.23, 1.48, -1.57],
     [26.66902, 21.82302, -1.736057, 1.56, 3.48, 1.4, -1.69],
     [31.31978, 8.162144, -1.6217787, 1.74, 3.77, 1.48, 2.79]], np.float32)


def test_lidar_init_with_gravity_center_origin():
    """origin=(0.5, 0.5, 0.5) init (test_box3d.py:100-138)."""
    gravity = np.array(
        [[-5.24223238e+00, 4.00209696e+01, 2.97570381e-01, 2.06200000e+00,
          4.40900000e+00, 1.54800000e+00, -1.48801203e+00],
         [-2.66751588e+01, 5.59499564e+00, -9.14345860e-01, 3.43000000e-01,
          4.58000000e-01, 7.82000000e-01, -4.62759755e+00],
         [-5.80979675e+00, 3.54092357e+01, 2.00889888e-01, 2.39600000e+00,
          3.96900000e+00, 1.73200000e+00, -4.65203216e+00],
         [-3.13086877e+01, 1.09007628e+00, -1.94612112e-01, 1.94400000e+00,
          3.85700000e+00, 1.72300000e+00, -2.81427027e+00]], np.float32)
    expected = np.array(
        [[-5.24223238e+00, 4.00209696e+01, -4.76429619e-01, 2.06200000e+00,
          4.40900000e+00, 1.54800000e+00, -1.48801203e+00],
         [-2.66751588e+01, 5.59499564e+00, -1.30534586e+00, 3.43000000e-01,
          4.58000000e-01, 7.82000000e-01, -4.62759755e+00],
         [-5.80979675e+00, 3.54092357e+01, -6.65110112e-01, 2.39600000e+00,
          3.96900000e+00, 1.73200000e+00, -4.65203216e+00],
         [-3.13086877e+01, 1.09007628e+00, -1.05611211e+00, 1.94400000e+00,
          3.85700000e+00, 1.72300000e+00, -2.81427027e+00]], np.float32)
    got = np.asarray(box_ops.to_bottom_center(jnp.asarray(gravity)))
    np.testing.assert_allclose(got, expected, atol=1e-6)
    # and the inverse
    np.testing.assert_allclose(
        np.asarray(box_ops.with_gravity_center(jnp.asarray(expected))),
        gravity, atol=1e-6)


def test_lidar_flip_golden():
    """Horizontal/vertical BEV flips with points (test_box3d.py:195-226)."""
    points = np.array([[1.2559, -0.6762, -1.4658],
                       [4.7814, -0.8784, -1.3857],
                       [6.7053, 0.2517, -0.9697],
                       [0.6533, -0.5520, -0.5265],
                       [4.5870, 0.5358, -1.4741]], np.float32)
    expected_h = np.array(
        [[1.7802081, -2.516249, -1.7501148, 1.75, 3.39, 1.65, 1.6615927],
         [8.959413, -2.4567227, -1.6357126, 1.54, 4.01, 1.57, 1.5215927],
         [28.2967, 0.5557558, -1.303325, 1.47, 2.23, 1.48, 4.7115927],
         [26.66902, -21.82302, -1.736057, 1.56, 3.48, 1.4, 4.8315926],
         [31.31978, -8.162144, -1.6217787, 1.74, 3.77, 1.48, 0.35159278]],
        np.float32)
    expected_pts_h = points * np.array([1, -1, 1], np.float32)
    flipped, pts = box_ops.flip_boxes(
        jnp.asarray(LIDAR_BOXES), 'horizontal', 'lidar', jnp.asarray(points))
    np.testing.assert_allclose(np.asarray(flipped), expected_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), expected_pts_h, atol=1e-3)

    expected_v = np.array(
        [[-1.7802, -2.5162, -1.7501, 1.7500, 3.3900, 1.6500, -1.6616],
         [-8.9594, -2.4567, -1.6357, 1.5400, 4.0100, 1.5700, -1.5216],
         [-28.2967, 0.5558, -1.3033, 1.4700, 2.2300, 1.4800, -4.7116],
         [-26.6690, -21.8230, -1.7361, 1.5600, 3.4800, 1.4000, -4.8316],
         [-31.3198, -8.1621, -1.6218, 1.7400, 3.7700, 1.4800, -0.3516]],
        np.float32)
    flipped_v, pts_v = box_ops.flip_boxes(
        flipped, 'vertical', 'lidar', pts)
    np.testing.assert_allclose(np.asarray(flipped_v), expected_v, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pts_v), expected_pts_h * np.array([-1, 1, 1], np.float32),
        atol=1e-3)


def test_lidar_rotate_golden():
    """rotate(0.13603681398218053) (test_box3d.py:228-245)."""
    # state after the two flips of the reference chain
    boxes = np.array(
        [[-1.7802081, -2.516249, -1.7501148, 1.75, 3.39, 1.65, -1.6615927],
         [-8.959413, -2.4567227, -1.6357126, 1.54, 4.01, 1.57, -1.5215927],
         [-28.2967, 0.5557558, -1.303325, 1.47, 2.23, 1.48, -4.7115927],
         [-26.66902, -21.82302, -1.736057, 1.56, 3.48, 1.4, -4.8315926],
         [-31.31978, -8.162144, -1.6217787, 1.74, 3.77, 1.48, -0.35159278]],
        np.float32)
    # the reference's rotate is applied to the *unflipped-x* chain: rebuild
    # the exact pre-rotation state (flip h then flip v of LIDAR_BOXES)
    b, _ = box_ops.flip_boxes(jnp.asarray(LIDAR_BOXES), 'horizontal', 'lidar')
    b, _ = box_ops.flip_boxes(b, 'vertical', 'lidar')
    np.testing.assert_allclose(np.asarray(b), boxes, atol=1e-4)

    points = np.array([[-1.2559, 0.6762, -1.4658],
                       [-4.7814, 0.8784, -1.3857],
                       [-6.7053, -0.2517, -0.9697],
                       [-0.6533, 0.5520, -0.5265],
                       [-4.5870, -0.5358, -1.4741]], np.float32)
    # the reference chain rotates the UNNEGATED-x boxes; the golden rotate
    # outputs below (test_box3d.py:228-243) correspond to the state after
    # only the horizontal flip:
    b_h, _ = box_ops.flip_boxes(jnp.asarray(LIDAR_BOXES), 'horizontal',
                                'lidar')
    rotated, pts, rot_mat_t = box_ops.rotate_boxes(
        b_h, 0.13603681398218053, 'lidar', jnp.asarray(points))
    expected = np.array(
        [[1.4225, -2.7344, -1.7501, 1.7500, 3.3900, 1.6500, 1.7976],
         [8.5435, -3.6491, -1.6357, 1.5400, 4.0100, 1.5700, 1.6576],
         [28.1106, -3.2869, -1.3033, 1.4700, 2.2300, 1.4800, 4.8476],
         [23.4630, -25.2382, -1.7361, 1.5600, 3.4800, 1.4000, 4.9676],
         [29.9235, -12.3342, -1.6218, 1.7400, 3.7700, 1.4800, 0.4876]],
        np.float32)
    expected_points = np.array([[-1.1526, 0.8403, -1.4658],
                                [-4.6181, 1.5187, -1.3857],
                                [-6.6775, 0.6600, -0.9697],
                                [-0.5724, 0.6355, -0.5265],
                                [-4.6173, 0.0912, -1.4741]], np.float32)
    expected_rot_mat_t = np.array([[0.9908, -0.1356, 0.0000],
                                   [0.1356, 0.9908, 0.0000],
                                   [0.0000, 0.0000, 1.0000]], np.float32)
    np.testing.assert_allclose(np.asarray(rotated), expected, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pts), expected_points, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rot_mat_t), expected_rot_mat_t,
                               atol=1e-3)


# state of the reference chain after scale(1.00559866335275) and
# translate([0.0838056, -0.13246193, -0.15701613]) (test_box3d.py:295-319)
LIDAR_TRANSLATED = np.array(
    [[1.1281544, -3.0507944, -1.9169292, 1.7597977, 3.4089797, 1.6592377,
      1.9336663],
     [8.098079, -4.9332013, -1.8018866, 1.5486219, 4.0324507, 1.57879,
      1.7936664],
     [27.64241, -7.2408795, -1.4676381, 1.4782301, 2.242485, 1.488286,
      4.9836664],
     [20.018322, -28.477297, -1.9027928, 1.5687338, 3.4994833, 1.4078381,
      5.1036663],
     [28.21472, -16.502048, -1.7878747, 1.7497417, 3.791107, 1.488286,
      0.6236664]], np.float32)


def test_lidar_nearest_bev_and_corners_golden():
    """nearest_bev (test_box3d.py:398-404) and corners (:408-449)."""
    boxes = LIDAR_TRANSLATED.copy()
    # reference applies limit_yaw() (offset 0.5, period pi) before these
    boxes[:, 6] = np.asarray(box_ops.limit_period(boxes[:, 6], 0.5, np.pi))
    expected_bev = np.array([[-0.5763, -3.9307, 2.8326, -2.1709],
                             [6.0819, -5.7075, 10.1143, -4.1589],
                             [26.5212, -7.9800, 28.7637, -6.5018],
                             [18.2686, -29.2617, 21.7681, -27.6929],
                             [27.3398, -18.3976, 29.0896, -14.6065]],
                            np.float32)
    got = np.asarray(box_ops.nearest_bev(jnp.asarray(boxes)))
    np.testing.assert_allclose(got, expected_bev, rtol=1e-4, atol=1e-4)

    expected_corners = np.array(
        [[[2.4093e+00, -4.4784e+00, -1.9169e+00],
          [2.4093e+00, -4.4784e+00, -2.5769e-01],
          [-7.7767e-01, -3.2684e+00, -2.5769e-01],
          [-7.7767e-01, -3.2684e+00, -1.9169e+00],
          [3.0340e+00, -2.8332e+00, -1.9169e+00],
          [3.0340e+00, -2.8332e+00, -2.5769e-01],
          [-1.5301e-01, -1.6232e+00, -2.5769e-01],
          [-1.5301e-01, -1.6232e+00, -1.9169e+00]],
         [[9.8933e+00, -6.1340e+00, -1.8019e+00],
          [9.8933e+00, -6.1340e+00, -2.2310e-01],
          [5.9606e+00, -5.2427e+00, -2.2310e-01],
          [5.9606e+00, -5.2427e+00, -1.8019e+00],
          [1.0236e+01, -4.6237e+00, -1.8019e+00],
          [1.0236e+01, -4.6237e+00, -2.2310e-01],
          [6.3029e+00, -3.7324e+00, -2.2310e-01],
          [6.3029e+00, -3.7324e+00, -1.8019e+00]],
         [[2.8525e+01, -8.2534e+00, -1.4676e+00],
          [2.8525e+01, -8.2534e+00, 2.0648e-02],
          [2.6364e+01, -7.6525e+00, 2.0648e-02],
          [2.6364e+01, -7.6525e+00, -1.4676e+00],
          [2.8921e+01, -6.8292e+00, -1.4676e+00],
          [2.8921e+01, -6.8292e+00, 2.0648e-02],
          [2.6760e+01, -6.2283e+00, 2.0648e-02],
          [2.6760e+01, -6.2283e+00, -1.4676e+00]],
         [[2.1337e+01, -2.9870e+01, -1.9028e+00],
          [2.1337e+01, -2.9870e+01, -4.9495e-01],
          [1.8102e+01, -2.8535e+01, -4.9495e-01],
          [1.8102e+01, -2.8535e+01, -1.9028e+00],
          [2.1935e+01, -2.8420e+01, -1.9028e+00],
          [2.1935e+01, -2.8420e+01, -4.9495e-01],
          [1.8700e+01, -2.7085e+01, -4.9495e-01],
          [1.8700e+01, -2.7085e+01, -1.9028e+00]],
         [[2.6398e+01, -1.7530e+01, -1.7879e+00],
          [2.6398e+01, -1.7530e+01, -2.9959e-01],
          [2.8612e+01, -1.4452e+01, -2.9959e-01],
          [2.8612e+01, -1.4452e+01, -1.7879e+00],
          [2.7818e+01, -1.8552e+01, -1.7879e+00],
          [2.7818e+01, -1.8552e+01, -2.9959e-01],
          [3.0032e+01, -1.5474e+01, -2.9959e-01],
          [3.0032e+01, -1.5474e+01, -1.7879e+00]]], np.float32)
    got = np.asarray(box_ops.corners(jnp.asarray(boxes)))
    np.testing.assert_allclose(got, expected_corners, rtol=1e-4, atol=1e-3)


def test_mode_conversion_roundtrips_golden():
    """LIDAR->CAM->LIDAR identity (test_box3d.py:483-505) and
    CAM<->DEPTH roundtrip (:506-516)."""
    cam = box_modes.convert(LIDAR_BOXES, 'lidar', 'cam')
    back = box_modes.convert(cam, 'cam', 'lidar')
    np.testing.assert_allclose(back, LIDAR_BOXES, atol=1e-5)

    depth = box_modes.convert(cam, 'cam', 'depth')
    cam2 = box_modes.convert(depth, 'depth', 'cam')
    np.testing.assert_allclose(cam, cam2, atol=1e-5)


def test_cam_to_lidar_with_rt_mat_golden():
    """CAM->LIDAR with the KITTI rect @ Trv2c calibration
    (test_box3d.py:520-571)."""
    camera_boxes = np.array(
        [[0.06, 1.77, 21.4, 3.2, 1.61, 1.66, -1.54],
         [6.59, 1.53, 6.76, 12.78, 3.66, 2.28, 1.55],
         [6.71, 1.59, 22.18, 14.73, 3.64, 2.32, 1.59],
         [7.11, 1.58, 34.54, 10.04, 3.61, 2.32, 1.61],
         [7.78, 1.65, 45.95, 12.83, 3.63, 2.34, 1.64]], np.float32)
    rect = np.array(
        [[0.9999239, 0.00983776, -0.00744505, 0.],
         [-0.0098698, 0.9999421, -0.00427846, 0.],
         [0.00740253, 0.00435161, 0.9999631, 0.],
         [0., 0., 0., 1.]], np.float32)
    trv2c = np.array(
        [[7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
         [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
         [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
         [0.000000e+00, 0.000000e+00, 0.000000e+00, 1.000000e+00]],
        np.float32)
    expected = np.array(
        [[2.16902434e+01, -4.06038554e-02, -1.61906639e+00, 1.65999997e+00,
          3.20000005e+00, 1.61000001e+00, -1.53999996e+00],
         [7.05006905e+00, -6.57459601e+00, -1.60107949e+00, 2.27999997e+00,
          1.27799997e+01, 3.66000009e+00, 1.54999995e+00],
         [2.24698818e+01, -6.69203759e+00, -1.50118145e+00, 2.31999993e+00,
          1.47299995e+01, 3.64000010e+00, 1.59000003e+00],
         [3.48291965e+01, -7.09058388e+00, -1.36622983e+00, 2.31999993e+00,
          1.00400000e+01, 3.60999990e+00, 1.61000001e+00],
         [4.62394617e+01, -7.75838800e+00, -1.32405020e+00, 2.33999991e+00,
          1.28299999e+01, 3.63000011e+00, 1.63999999e+00]], np.float32)
    rt_mat = rect @ trv2c
    got = box_modes.convert(camera_boxes, 'cam', 'lidar',
                            np.linalg.inv(rt_mat))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
    # and back
    back = box_modes.convert(got, 'lidar', 'cam', rt_mat)
    np.testing.assert_allclose(back, camera_boxes, rtol=1e-4, atol=1e-4)


def test_cam_flip_and_rotate_golden():
    """CAM-mode vertical flip tensor (test_box3d.py:689-695) and the
    camera rotation matrix (:720-724)."""
    cam_boxes = box_modes.convert(LIDAR_BOXES, 'lidar', 'cam')
    flipped_h, _ = box_ops.flip_boxes(jnp.asarray(cam_boxes), 'horizontal',
                                      'cam')
    flipped_v, _ = box_ops.flip_boxes(flipped_h, 'vertical', 'cam')
    expected_v = np.array(
        [[2.5162, 1.7501, -1.7802, 3.3900, 1.6500, 1.7500, -1.6616],
         [2.4567, 1.6357, -8.9594, 4.0100, 1.5700, 1.5400, -1.5216],
         [-0.5558, 1.3033, -28.2967, 2.2300, 1.4800, 1.4700, -4.7116],
         [21.8230, 1.7361, -26.6690, 3.4800, 1.4000, 1.5600, -4.8316],
         [8.1621, 1.6218, -31.3198, 3.7700, 1.4800, 1.7400, -0.3516]],
        np.float32)
    np.testing.assert_allclose(np.asarray(flipped_v), expected_v, atol=1e-4)

    _, _, rot_mat_t = box_ops.rotate_boxes(
        flipped_h, 0.13603681398218053, 'cam')
    expected_rot = np.array([[0.9908, 0.0000, -0.1356],
                             [0.0000, 1.0000, 0.0000],
                             [0.1356, 0.0000, 0.9908]], np.float32)
    np.testing.assert_allclose(np.asarray(rot_mat_t), expected_rot, atol=1e-3)

    # cam rotate golden boxes = convert of the lidar rotate golden
    rotated, _, _ = box_ops.rotate_boxes(
        flipped_h, 0.13603681398218053, 'cam')
    lidar_rot_golden = np.array(
        [[1.4225, -2.7344, -1.7501, 1.7500, 3.3900, 1.6500, 1.7976],
         [8.5435, -3.6491, -1.6357, 1.5400, 4.0100, 1.5700, 1.6576],
         [28.1106, -3.2869, -1.3033, 1.4700, 2.2300, 1.4800, 4.8476],
         [23.4630, -25.2382, -1.7361, 1.5600, 3.4800, 1.4000, 4.9676],
         [29.9235, -12.3342, -1.6218, 1.7400, 3.7700, 1.4800, 0.4876]],
        np.float32)
    np.testing.assert_allclose(
        np.asarray(rotated), box_modes.convert(lidar_rot_golden, 'lidar',
                                               'cam'), atol=1e-3)


DEPTH_BOXES = np.array(
    [[1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601],
     [2.3262, 3.3065, 0.44255, 0.8234, 0.5325, 1.0099, 2.9971]], np.float32)


def test_depth_properties_golden():
    """gravity_center / bev / nearest_bev (test_box3d.py:984-996)."""
    np.testing.assert_allclose(
        np.asarray(box_ops.gravity_center(jnp.asarray(DEPTH_BOXES))),
        np.array([[1.4856, 2.5299, -0.1093],
                  [2.3262, 3.3065, 0.9475]], np.float32), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(box_ops.bev(jnp.asarray(DEPTH_BOXES))),
        np.array([[1.4856, 2.5299, 0.9385, 2.1404, 3.0601],
                  [2.3262, 3.3065, 0.8234, 0.5325, 2.9971]], np.float32),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(box_ops.nearest_bev(jnp.asarray(DEPTH_BOXES))),
        np.array([[1.0164, 1.4597, 1.9548, 3.6001],
                  [1.9145, 3.0402, 2.7379, 3.5728]], np.float32), atol=1e-4)


def test_depth_flip_and_rotate_golden():
    """Depth flips (test_box3d.py:1022-1050) and rotate (:1052-1070)."""
    boxes = np.array(
        [[1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601],
         [2.3262, 3.3065, 0.44255, 0.8234, 0.5325, 1.0099, 2.9971],
         [2.4593, 2.5870, -0.4321, 0.8597, 0.6193, 1.0204, 3.0693],
         [1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601]],
        np.float32)
    points = np.array([[0.6762, 1.2559, -1.4658, 2.5359],
                       [0.8784, 4.7814, -1.3857, 0.7167],
                       [-0.2517, 6.7053, -0.9697, 0.5599],
                       [0.5520, 0.6533, -0.5265, 1.0032],
                       [-0.5358, 4.5870, -1.4741, 0.0556]], np.float32)
    expected_h = np.array(
        [[-1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 0.0815],
         [-2.3262, 3.3065, 0.4426, 0.8234, 0.5325, 1.0099, 0.1445],
         [-2.4593, 2.5870, -0.4321, 0.8597, 0.6193, 1.0204, 0.0723],
         [-1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 0.0815]],
        np.float32)
    flipped_h, pts = box_ops.flip_boxes(
        jnp.asarray(boxes), 'horizontal', 'depth', jnp.asarray(points))
    np.testing.assert_allclose(np.asarray(flipped_h), expected_h, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pts)[:, 0], -points[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts)[:, 3], points[:, 3], atol=0)

    expected_v = np.array(
        [[-1.4856, -2.5299, -0.5570, 0.9385, 2.1404, 0.8954, -0.0815],
         [-2.3262, -3.3065, 0.4426, 0.8234, 0.5325, 1.0099, -0.1445],
         [-2.4593, -2.5870, -0.4321, 0.8597, 0.6193, 1.0204, -0.0723],
         [-1.4856, -2.5299, -0.5570, 0.9385, 2.1404, 0.8954, -0.0815]],
        np.float32)
    flipped_v, pts = box_ops.flip_boxes(flipped_h, 'vertical', 'depth', pts)
    np.testing.assert_allclose(np.asarray(flipped_v), expected_v, atol=1e-3)

    expected_rot = np.array(
        [[-1.5434, -2.4951, -0.5570, 0.9385, 2.1404, 0.8954, -0.0585],
         [-2.4016, -3.2521, 0.4426, 0.8234, 0.5325, 1.0099, -0.1215],
         [-2.5181, -2.5298, -0.4321, 0.8597, 0.6193, 1.0204, -0.0493],
         [-1.5434, -2.4951, -0.5570, 0.9385, 2.1404, 0.8954, -0.0585]],
        np.float32)
    expected_points = np.array([[-0.7049, -1.2400, -1.4658, 2.5359],
                                [-0.9881, -4.7599, -1.3857, 0.7167],
                                [0.0974, -6.7093, -0.9697, 0.5599],
                                [-0.5669, -0.6404, -0.5265, 1.0032],
                                [0.4302, -4.5981, -1.4741, 0.0556]],
                               np.float32)
    expected_rot_mat = np.array([[0.9997, -0.0230, 0.0000],
                                 [0.0230, 0.9997, 0.0000],
                                 [0.0000, 0.0000, 1.0000]], np.float32)
    rotated, pts, rot_mat_t = box_ops.rotate_boxes(
        flipped_v, -0.022998953275003075, 'depth', pts)
    np.testing.assert_allclose(np.asarray(rotated), expected_rot, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pts), expected_points, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rot_mat_t), expected_rot_mat,
                               atol=1e-3)


def test_overlaps_3d_golden():
    """Rotated 3D IoU/IoF goldens (test_box3d.py:906-938) — CUDA-gated in the
    reference (``boxes_overlap_bev_gpu``), exactly reproducible by the
    TPU-native clipping implementation on CPU."""
    boxes1 = np.array(
        [[1.8, -2.5, -1.8, 1.75, 3.39, 1.65, 1.6615927],
         [8.9, -2.5, -1.6, 1.54, 4.01, 1.57, 1.5215927],
         [28.3, 0.5, -1.3, 1.47, 2.23, 1.48, 4.7115927],
         [31.3, -8.2, -1.6, 1.74, 3.77, 1.48, 0.35]], np.float32)
    boxes2 = np.array(
        [[1.2, -3.0, -1.9, 1.8, 3.4, 1.7, 1.9],
         [8.1, -2.9, -1.8, 1.5, 4.1, 1.6, 1.8],
         [31.3, -8.2, -1.6, 1.74, 3.77, 1.48, 0.35],
         [20.1, -28.5, -1.9, 1.6, 3.5, 1.4, 5.1]], np.float32)
    expected_iou = np.array(
        [[0.3710, 0.0000, 0.0000, 0.0000],
         [0.0000, 0.3322, 0.0000, 0.0000],
         [0.0000, 0.0000, 0.0000, 0.0000],
         [0.0000, 0.0000, 1.0000, 0.0000]], np.float32)
    got = np.asarray(iou_ops.bbox_overlaps_3d(
        jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(got, expected_iou, rtol=1e-3, atol=1e-4)

    expected_iof = np.array(
        [[0.5582, 0.0000, 0.0000, 0.0000],
         [0.0000, 0.5025, 0.0000, 0.0000],
         [0.0000, 0.0000, 0.0000, 0.0000],
         [0.0000, 0.0000, 1.0000, 0.0000]], np.float32)
    got = np.asarray(iou_ops.bbox_overlaps_3d(
        jnp.asarray(boxes1), jnp.asarray(boxes2), mode='iof'))
    np.testing.assert_allclose(got, expected_iof, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Utility-function goldens (test_box3d.py:1197-1262).  Inputs that the
# reference draws via ``torch.manual_seed(0); torch.rand(...)`` are
# regenerated with torch (cpu) at test time; expected tensors are the
# reference's literal constants.
# ---------------------------------------------------------------------------

def test_rotation_3d_in_axis_x_golden():
    """axis=0 rotation constants (test_box3d.py:1197-1213)."""
    points = jnp.asarray([[[-0.4599, -0.0471, 0.0000],
                           [-0.4599, -0.0471, 1.8433],
                           [-0.4599, 0.0471, 1.8433]],
                          [[-0.2555, -0.2683, 0.0000],
                           [-0.2555, -0.2683, 0.9072],
                           [-0.2555, 0.2683, 0.9072]]], jnp.float32)
    angles = jnp.asarray([-np.pi / 10, np.pi / 10], jnp.float32)
    expected = np.array([[[0.0000, -0.4228, -0.1869],
                          [1.8433, -0.4228, -0.1869],
                          [1.8433, -0.4519, -0.0973]],
                         [[0.0000, -0.3259, -0.1762],
                          [0.9072, -0.3259, -0.1762],
                          [0.9072, -0.1601, 0.3341]]], np.float32)
    got = np.asarray(box_ops.rotation_3d_in_axis(points, angles, axis=0))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_limit_period_golden():
    """limit_period on torch.manual_seed(0) draws (test_box3d.py:1215-1221)."""
    import torch
    torch.manual_seed(0)
    val = torch.rand([5, 1]).numpy()
    expected = np.array([[0.4963], [0.7682], [0.0885], [0.1320], [0.3074]],
                        np.float32)
    got = np.asarray(box_ops.limit_period(jnp.asarray(val)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_xywhr2xyxyr_golden():
    """(test_box3d.py:1224-1232)."""
    xywhr = jnp.asarray([[1., 2., 3., 4., 5.], [0., 1., 2., 3., 4.]],
                        jnp.float32)
    expected = np.array([[-0.5000, 0.0000, 2.5000, 4.0000, 5.0000],
                         [-1.0000, -0.5000, 1.0000, 2.5000, 4.0000]],
                        np.float32)
    got = np.asarray(box_ops.xywhr2xyxyr(xywhr))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_points_cam2img_golden():
    """Projective division constants (test_box3d.py:1253-1262)."""
    import torch
    torch.manual_seed(0)
    points = torch.rand([5, 3]).numpy()
    proj_mat = torch.rand([4, 4]).numpy()
    expected = np.array([[0.5832, 0.6496], [0.6146, 0.7910],
                         [0.6994, 0.7782], [0.5623, 0.6303],
                         [0.4359, 0.6532]], np.float32)
    got = np.asarray(box_ops.points_cam2img(jnp.asarray(points),
                                            jnp.asarray(proj_mat)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)
