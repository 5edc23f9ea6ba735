"""Dataset + pipeline tests on synthesized mini-fixtures."""

import os
import pickle

import numpy as np
import pytest

from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl


def _write_png(path, h, w, seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
    return img


@pytest.fixture()
def kitti_root(tmp_path):
    root = str(tmp_path / 'kitti')
    _write_png(os.path.join(root, 'training/image_2/000000.png'), 375, 1242)
    # reuse the reference fixture's calib/annos (data, not code)
    with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl', 'rb') as f:
        infos = pickle.load(f)
    with open(os.path.join(root, 'kitti_infos_train.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_kitti_dataset_sample(kitti_root):
    img_cfg = pl.ImagePipelineConfig(
        test_scale=(1280, 384), pad_size=(384, 1280),
        train_pad_size=(416, 1408), flip_ratio=0.5,
        train_scales=((1173, 352), (1387, 416)))
    d = ds.KittiMultiViewDataset(
        kitti_root, os.path.join(kitti_root, 'kitti_infos_train.pkl'),
        ('Pedestrian', 'Car'), img_cfg, max_gt=8)
    rng = np.random.RandomState(0)
    s = d.get_sample(0, train=False, rng=rng)
    assert s['images'].shape == (1, 384, 1280, 3)
    assert s['intrinsics'].shape == (3, 3)
    assert s['extrinsics'].shape == (1, 4, 4)
    # KITTI origin = center of the point cloud range
    np.testing.assert_allclose(s['origin'], [34.56, 0.0, -1.0], atol=1e-5)
    # the fixture has one Pedestrian inside range
    assert s['gt_mask'].sum() == 1
    box = s['gt_boxes'][0]
    assert 0 < box[0] < 69.12 and -39.68 < box[1] < 39.68
    # lidar dims (w, l, h): pedestrian ~ (0.5, 1.2, 1.89)
    assert box[5] > box[3]  # height > width for a pedestrian
    # ratio = ori_h / (img_h / 4)
    np.testing.assert_allclose(
        s['ratio'], s['ori_shape'][0] / (s['img_shape'][0] / 4.0), rtol=1e-6)

    batch = d.collate([s, d.get_sample(0, train=False, rng=rng)])
    assert batch['images'].shape == (2, 1, 384, 1280, 3)
    assert batch['gt_boxes'].shape == (2, 8, 7)

    s_train = d.get_sample(0, train=True, rng=rng)
    assert s_train['images'].shape == (1, 416, 1408, 3)


def test_kitti_flip_preserves_projection_consistency(kitti_root):
    """Flipping image + conjugating matrices must keep GT boxes projecting
    onto the flipped image location."""
    img_cfg = pl.ImagePipelineConfig(test_scale=(1280, 384),
                                     pad_size=(384, 1280), flip_ratio=1.0)
    d = ds.KittiMultiViewDataset(
        kitti_root, os.path.join(kitti_root, 'kitti_infos_train.pkl'),
        ('Pedestrian',), img_cfg, max_gt=8)
    rng = np.random.RandomState(0)
    s_plain = d.get_sample(0, train=False, rng=rng)
    s_flip = d.get_sample(0, train=True, rng=rng)
    assert s_flip['flip']

    def project_center(s):
        box = s['gt_boxes'][0]
        center = np.array([box[0], box[1], box[2] + box[5] / 2, 1.0])
        proj = s['intrinsics'] @ s['extrinsics'][0][:3]
        uvw = proj @ center
        return uvw[:2] / uvw[2]

    u_plain = project_center(s_plain)
    u_flip = project_center(s_flip)
    w = s_plain['ori_shape'][1]
    np.testing.assert_allclose(u_flip[0], w - u_plain[0], atol=1.0)
    np.testing.assert_allclose(u_flip[1], u_plain[1], atol=1.0)


@pytest.fixture()
def sunrgbd_root(tmp_path):
    root = str(tmp_path / 'sunrgbd')
    _write_png(os.path.join(root, 'image/000001.jpg'), 530, 730)
    rng = np.random.RandomState(1)
    k = np.array([[529.5, 0, 0], [0, 529.5, 0], [365, 265, 1]])  # column-major
    rt = np.eye(3)
    infos = [dict(
        image=dict(image_idx=1, image_path='image/000001.jpg',
                   image_shape=np.array([530, 730], np.int32)),
        calib=dict(K=k.reshape(-1), Rt=rt),
        annos=dict(
            gt_num=2,
            gt_boxes_upright_depth=np.array(
                [[0.5, 2.0, 0.2, 1.0, 0.8, 0.9, 0.3],
                 [-0.5, 3.0, 0.0, 2.0, 1.0, 0.7, -0.2]]),
            **{'class': np.array([0, 1])},
            name=np.array(['bed', 'table']),
        ),
    )]
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_sunrgbd_dataset_sample(sunrgbd_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(640, 480),
                                     pad_size=(480, 640))
    d = ds.SunRgbdMultiViewDataset(
        sunrgbd_root, os.path.join(sunrgbd_root, 'infos.pkl'),
        ('bed', 'table'), img_cfg, max_gt=8)
    s = d.get_sample(0, train=False, rng=np.random.RandomState(0))
    assert s['images'].shape == (1, 480, 640, 3)
    np.testing.assert_allclose(s['origin'], [0, 3, -1])
    assert s['gt_mask'].sum() == 2
    # origin(.5,.5,.5) -> bottom-center conversion
    np.testing.assert_allclose(s['gt_boxes'][0, 2], 0.2 - 0.45, atol=1e-6)
    # intrinsic is K transposed (column-major storage)
    np.testing.assert_allclose(s['intrinsics'][0, 2], 365.0)


@pytest.fixture()
def scannet_root(tmp_path):
    root = str(tmp_path / 'scannet')
    for i in range(3):
        _write_png(os.path.join(root, f'posed_images/scene/{i}.jpg'), 480, 640,
                   seed=i)
    rng = np.random.RandomState(2)
    poses = [np.eye(4) + 0.01 * np.diag(rng.rand(4)) for _ in range(3)]
    infos = [dict(
        img_paths=[f'posed_images/scene/{i}.jpg' for i in range(3)],
        intrinsics=np.array([[577.8, 0, 320, 0], [0, 577.8, 240, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1]]),
        extrinsics=poses,
        annos=dict(
            gt_num=1,
            axis_align_matrix=np.eye(4),
            gt_boxes_upright_depth=np.array([[1.0, 1.0, 0.5, 1.0, 1.0, 1.0]]),
            **{'class': np.array([3])},
        ),
    )]
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_scannet_dataset_multiview(scannet_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(640, 480),
                                     pad_size=(480, 640),
                                     fixed_size_resize=True)
    d = ds.ScanNetMultiViewDataset(
        scannet_root, os.path.join(scannet_root, 'infos.pkl'),
        ('a', 'b', 'c', 'd'), img_cfg, n_images=5, max_gt=4)
    rng = np.random.RandomState(0)
    s = d.get_sample(0, train=False, rng=rng)
    # 5 views sampled with replacement from 3 available
    assert s['images'].shape == (5, 480, 640, 3)
    assert s['extrinsics'].shape == (5, 4, 4)
    np.testing.assert_allclose(s['origin'], [0, 0, 0.5])
    # yaw-free box, bottom z = 0.5 - 0.5 = 0
    np.testing.assert_allclose(s['gt_boxes'][0],
                               [1, 1, 0, 1, 1, 1, 0], atol=1e-6)
    # train mode shifts the origin
    s_train = d.get_sample(0, train=True, rng=rng)
    assert not np.allclose(s_train['origin'], [0, 0, 0.5])
    assert np.allclose(s_train['origin'][2], 0.5)


@pytest.fixture()
def nuscenes_root(tmp_path):
    root = str(tmp_path / 'nuscenes')
    cams = {}
    for i, cam in enumerate(ds.NuScenesMultiViewDataset.CAMERAS):
        path = f'samples/{cam}/0.jpg'
        _write_png(os.path.join(root, path), 900, 1600, seed=i)
        theta = i * np.pi / 3
        rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0],
                        [0, 0, 1]])
        cams[cam] = dict(
            data_path=path,
            cam_intrinsic=np.array([[1266.0, 0, 800.0],
                                    [0, 1266.0, 450.0], [0, 0, 1.0]]),
            sensor2lidar_rotation=rot,
            sensor2lidar_translation=np.array([0.1 * i, 0.0, 1.5]),
        )
    infos = dict(infos=[dict(
        cams=cams,
        gt_boxes=np.array([
            [10.0, 5.0, 0.0, 1.9, 4.6, 1.7, 0.3],     # in range
            [80.0, 5.0, 0.0, 1.9, 4.6, 1.7, 0.3],     # x > 49.92 -> dropped
            [10.0, -70.0, 0.0, 1.9, 4.6, 1.7, 0.3],   # y < -49.92 -> dropped
        ], np.float32),
        gt_names=np.array(['car', 'car', 'car']),
        num_lidar_pts=np.array([10, 10, 10]),
    )], metadata=dict(version='v1.0-mini'))
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_nuscenes_origin_and_range_filter(nuscenes_root):
    """Reference pipeline parity (``imvoxelnet_nuscenes.py:95-96,108``):
    KittiSetOrigin on point_cloud_range [-49.92,-49.92,-2.92,49.92,49.92,.92]
    -> origin = midpoint = (0, 0, -1); ObjectRangeFilter drops GT whose BEV
    center falls outside the range."""
    img_cfg = pl.ImagePipelineConfig(test_scale=(1600, 900),
                                     pad_size=(928, 1600))
    d = ds.NuScenesMultiViewDataset(
        nuscenes_root, os.path.join(nuscenes_root, 'infos.pkl'),
        ('car',), img_cfg, n_images=6, max_gt=8)
    s = d.get_sample(0, train=True, rng=np.random.RandomState(0))
    # origin derived from the reference config's point_cloud_range constants
    pcr = np.array([-49.92, -49.92, -2.92, 49.92, 49.92, 0.92])
    expected_origin = (pcr[:3] + pcr[3:]) / 2
    np.testing.assert_allclose(expected_origin, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(s['origin'], expected_origin, atol=1e-6)
    # ObjectRangeFilter: only the in-range box survives
    assert s['gt_mask'].sum() == 1
    np.testing.assert_allclose(s['gt_boxes'][0, :2], [10.0, 5.0], atol=1e-6)
    assert s['images'].shape == (6, 928, 1600, 3)
    assert s['extrinsics'].shape == (6, 4, 4)
    # identity intrinsic: the full lidar2img lives in the extrinsics
    np.testing.assert_allclose(s['intrinsics'], np.eye(3), atol=1e-6)


def test_kitti_stereo_dataset(kitti_root):
    import shutil
    # synthesize the image_3 twin
    src = os.path.join(kitti_root, 'training/image_2/000000.png')
    dst = os.path.join(kitti_root, 'training/image_3/000000.png')
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copy(src, dst)
    img_cfg = pl.ImagePipelineConfig(test_scale=(1280, 384),
                                     pad_size=(384, 1280))
    d = ds.KittiStereoDataset(
        kitti_root, os.path.join(kitti_root, 'kitti_infos_train.pkl'),
        ('Pedestrian',), img_cfg, n_images=2, max_gt=8)
    s = d.get_sample(0, train=False, rng=np.random.RandomState(0))
    assert s['images'].shape[0] == 2
    assert s['extrinsics'].shape == (2, 4, 4)
    # P2/P3 translations differ -> the two extrinsics differ
    assert not np.allclose(s['extrinsics'][0], s['extrinsics'][1])


# --- reference-fixture compatibility: our readers consume the reference's
# own tests/data info pkls (real schema + real calibration values; image
# pixels are synthesized since the reference ships no camera jpgs)

@pytest.fixture()
def sunrgbd_ref_root(tmp_path):
    import cv2
    root = str(tmp_path / 'sunrgbd_ref')
    with open('/root/reference/tests/data/sunrgbd/sunrgbd_infos.pkl',
              'rb') as f:
        infos = pickle.load(f)
    rel = infos[0]['image']['image_path']
    h, w = infos[0]['image']['image_shape']
    target = os.path.normpath(os.path.join(root, rel))
    os.makedirs(os.path.dirname(target), exist_ok=True)
    ok, buf = cv2.imencode('.png', np.random.RandomState(0).randint(
        0, 255, (int(h), int(w), 3), np.uint8))
    assert ok
    with open(target, 'wb') as f:     # extensionless path; cv2 sniffs content
        f.write(buf.tobytes())
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def test_sunrgbd_reads_reference_fixture_infos(sunrgbd_ref_root):
    """``tests/data/sunrgbd/sunrgbd_infos.pkl`` (the reference's own test
    fixture) flows through our reader: real K/Rt calibration, real GT with
    the origin-(.5,.5,.5) -> bottom-center conversion."""
    img_cfg = pl.ImagePipelineConfig(test_scale=(640, 480),
                                     pad_size=(480, 640))
    d = ds.SunRgbdMultiViewDataset(
        sunrgbd_ref_root, os.path.join(sunrgbd_ref_root, 'infos.pkl'),
        ('bed', 'night_stand', 'dresser'), img_cfg, max_gt=8)
    s = d.get_sample(0, train=False, rng=np.random.RandomState(0))
    assert s['images'].shape == (1, 480, 640, 3)
    np.testing.assert_allclose(s['origin'], [0, 3, -1])
    assert s['gt_mask'].sum() == 3
    # the fixture's first box: center z -0.246859, h 1.969614
    np.testing.assert_allclose(
        s['gt_boxes'][0, 2], -0.246859 - 1.969614 / 2, atol=1e-5)
    np.testing.assert_allclose(s['gt_boxes'][0, :2],
                               [1.047307, 4.168696], atol=1e-5)
    # K is stored flat column-major; our intrinsic is its transpose
    K = np.asarray(d.data_infos[0]['calib']['K']).reshape(3, 3).T
    np.testing.assert_allclose(s['intrinsics'], K, atol=1e-6)


@pytest.fixture()
def nuscenes_ref_root(tmp_path):
    root = str(tmp_path / 'nuscenes_ref')
    with open('/root/reference/tests/data/nuscenes/nus_info.pkl', 'rb') as f:
        data = pickle.load(f)
    for info in data['infos']:
        for i, (cam, ci) in enumerate(sorted(info['cams'].items())):
            rel = os.path.join('samples', cam,
                               os.path.basename(ci['data_path']))
            ci['data_path'] = rel
            _write_png(os.path.join(root, rel), 90, 160, seed=i)
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(data, f)
    return root


def test_nuscenes_reads_reference_fixture_infos(nuscenes_ref_root):
    """``tests/data/nuscenes/nus_info.pkl``: real 6-camera sensor2lidar
    transforms + real GT through our lidar2img composition, car filter and
    range filter."""
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 90),
                                     pad_size=(96, 160))
    d = ds.NuScenesMultiViewDataset(
        nuscenes_ref_root, os.path.join(nuscenes_ref_root, 'infos.pkl'),
        ('car',), img_cfg, n_images=6, max_gt=32)
    info = d.data_infos[0]
    s = d.get_sample(0, train=True, rng=np.random.RandomState(0))
    assert s['images'].shape == (6, 96, 160, 3)
    assert s['extrinsics'].shape == (6, 4, 4)
    np.testing.assert_allclose(s['origin'], [0, 0, -1], atol=1e-6)

    # independent oracle for the kept-GT count: valid cars whose BEV center
    # lies inside the reference point_cloud_range
    names = np.asarray(info['gt_names'])
    mask = np.asarray(info['num_lidar_pts']) > 0
    if 'valid_flag' in info:
        mask = np.asarray(info['valid_flag'])
    boxes = np.asarray(info['gt_boxes'], np.float64)
    cars = (names == 'car') & mask
    in_range = (np.abs(boxes[:, 0]) < 49.92) & (np.abs(boxes[:, 1]) < 49.92)
    assert s['gt_mask'].sum() == int((cars & in_range).sum()) > 0

    # every kept car must project with positive depth into at least one of
    # the real cameras' nominal 1600x900 frames (lidar2img composition check)
    kept = np.asarray(s['gt_boxes'])[np.asarray(s['gt_mask'])]
    for box in kept:
        center = np.array([box[0], box[1], box[2] + box[5] / 2, 1.0])
        seen = False
        for v in range(6):
            uvw = np.asarray(s['extrinsics'][v])[:3] @ center
            if uvw[2] > 0.5:
                uv = uvw[:2] / uvw[2]
                if 0 <= uv[0] < 1600 and 0 <= uv[1] < 900:
                    seen = True
        assert seen, box
