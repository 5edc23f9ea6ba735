import numpy as np

from imvoxelnet_tpu.core import box_modes as bm


def test_cam_lidar_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([rng.randn(5, 3), rng.rand(5, 3) + 0.5,
                            rng.randn(5, 1)], 1).astype(np.float32)
    out = bm.convert(bm.convert(boxes, bm.CAM, bm.LIDAR), bm.LIDAR, bm.CAM)
    np.testing.assert_allclose(out, boxes, atol=1e-6)


def test_cam_to_lidar_default_axes():
    # cam (x right, y down, z front) -> lidar (x front, y left, z up)
    box = np.array([[1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 0.5]])
    out = bm.convert(box, bm.CAM, bm.LIDAR)
    # default rt: lidar (x, y, z) = (z_cam, -x_cam, -y_cam)
    np.testing.assert_allclose(out[0, :3], [3.0, -1.0, -2.0], atol=1e-6)
    # sizes (x=l, y=h, z=w) -> (w, l, h)
    np.testing.assert_allclose(out[0, 3:6], [3.0, 1.0, 2.0], atol=1e-6)
    assert out[0, 6] == 0.5  # yaw carried unchanged (v0.8 convention)


def test_depth_lidar_roundtrip():
    rng = np.random.RandomState(1)
    boxes = np.concatenate([rng.randn(4, 3), rng.rand(4, 3) + 0.5,
                            rng.randn(4, 1)], 1)
    out = bm.convert(bm.convert(boxes, bm.DEPTH, bm.LIDAR), bm.LIDAR, bm.DEPTH)
    np.testing.assert_allclose(out, boxes, atol=1e-6)


def test_custom_rt_matches_dataset_math():
    """The KITTI dataset's cam->lidar with rt = inv(rect @ Trv2c) must equal
    convert(CAM, LIDAR, rt)."""
    import pickle
    with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl',
              'rb') as f:
        info = pickle.load(f)[0]
    rect = info['calib']['R0_rect'].astype(np.float32)
    trv2c = info['calib']['Tr_velo_to_cam'].astype(np.float32)
    loc = info['annos']['location'].astype(np.float32)
    dims = info['annos']['dimensions'].astype(np.float32)
    rots = info['annos']['rotation_y'].astype(np.float32)
    boxes_cam = np.concatenate([loc, dims, rots[:, None]], 1)
    rt = np.linalg.inv(rect @ trv2c)
    out = bm.convert(boxes_cam, bm.CAM, bm.LIDAR, rt_mat=rt)

    xyz1 = np.concatenate([loc, np.ones((len(loc), 1), np.float32)], 1)
    exp_xyz = (xyz1 @ rt.T)[:, :3]
    np.testing.assert_allclose(out[:, :3], exp_xyz, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:6], dims[:, [2, 0, 1]], atol=1e-6)
