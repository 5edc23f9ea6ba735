"""Devkit-free nuScenes converter: synthetic-table round trip + geometry."""

import json
import os

import numpy as np
import pytest

from imvoxelnet_tpu.data.converters import nuscenes_converter as nc


def _write_tables(root, version='v1.0-mini'):
    base = os.path.join(root, version)
    os.makedirs(base, exist_ok=True)

    def dump(name, rows):
        with open(os.path.join(base, f'{name}.json'), 'w') as f:
            json.dump(rows, f)

    # one scene, one sample, LIDAR_TOP at ego origin (identity), one camera
    qi = [1.0, 0.0, 0.0, 0.0]
    # camera: +90deg yaw about z, offset (1, 0, 1.5)
    s2 = np.sqrt(0.5)
    q_cam = [s2, 0.0, 0.0, s2]
    dump('sensor', [
        dict(token='sen_lidar', channel='LIDAR_TOP', modality='lidar'),
        dict(token='sen_cam', channel='CAM_FRONT', modality='camera'),
    ])
    dump('calibrated_sensor', [
        dict(token='cs_lidar', sensor_token='sen_lidar',
             translation=[0, 0, 0], rotation=qi, camera_intrinsic=[]),
        dict(token='cs_cam', sensor_token='sen_cam',
             translation=[1.0, 0.0, 1.5], rotation=q_cam,
             camera_intrinsic=[[500, 0, 320], [0, 500, 240], [0, 0, 1]]),
    ])
    dump('ego_pose', [
        dict(token='ep', translation=[0, 0, 0], rotation=qi, timestamp=0),
    ])
    dump('sample_data', [
        dict(token='sd_lidar', sample_token='samp', ego_pose_token='ep',
             calibrated_sensor_token='cs_lidar', filename='lidar.bin',
             is_key_frame=True, timestamp=0),
        dict(token='sd_cam', sample_token='samp', ego_pose_token='ep',
             calibrated_sensor_token='cs_cam', filename='cam.jpg',
             is_key_frame=True, timestamp=0),
    ])
    dump('sample', [
        dict(token='samp', scene_token='sc', next='', prev='', timestamp=0),
    ])
    dump('scene', [
        dict(token='sc', name='scene-0001', first_sample_token='samp'),
    ])
    dump('sample_annotation', [
        dict(token='ann', sample_token='samp', translation=[5.0, 2.0, 1.0],
             size=[2.0, 4.5, 1.7], rotation=qi,
             category_name='vehicle.car', num_lidar_pts=10, num_radar_pts=2),
    ])
    return root


def test_converter_geometry(tmp_path):
    root = _write_tables(str(tmp_path))
    train, val = nc.create_nuscenes_infos(root, 'v1.0-mini')
    assert len(train) == 1 and len(val) == 0
    info = train[0]
    cam = info['cams']['CAM_FRONT']
    # identity lidar/ego pose: sensor2lidar == the camera calibration
    np.testing.assert_allclose(cam['sensor2lidar_translation'],
                               [1.0, 0.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(cam['sensor2lidar_rotation'],
                               nc.quat_to_mat([np.sqrt(0.5), 0, 0,
                                               np.sqrt(0.5)]), atol=1e-6)
    # GT box unchanged in position, wlh sizes, yaw = -0 - pi/2
    np.testing.assert_allclose(info['gt_boxes'][0, :3], [5, 2, 1], atol=1e-6)
    np.testing.assert_allclose(info['gt_boxes'][0, 3:6], [2, 4.5, 1.7])
    np.testing.assert_allclose(info['gt_boxes'][0, 6], -np.pi / 2, atol=1e-6)
    assert info['gt_names'][0] == 'car'
    assert info['valid_flag'][0]


def test_dataset_reads_converted_infos(tmp_path):
    root = _write_tables(str(tmp_path))
    nc.create_nuscenes_infos(root, 'v1.0-mini')

    from imvoxelnet_tpu.data import datasets as ds
    from imvoxelnet_tpu.data import pipeline as pl

    # the dataset wants all six cameras; duplicate CAM_FRONT entries
    import pickle
    with open(os.path.join(root, 'nuscenes_infos_train.pkl'), 'rb') as f:
        payload = pickle.load(f)
    info = payload['infos'][0]
    for cam in ds.NuScenesMultiViewDataset.CAMERAS:
        info['cams'].setdefault(cam, info['cams']['CAM_FRONT'])
    with open(os.path.join(root, 'nuscenes_infos_train.pkl'), 'wb') as f:
        pickle.dump(payload, f)

    d = ds.NuScenesMultiViewDataset(
        root, os.path.join(root, 'nuscenes_infos_train.pkl'), ('car',),
        pl.ImagePipelineConfig(), n_images=6)
    data = d.get_data_info(0)
    assert len(data['extrinsics']) == 6
    ann = d.get_ann_info(0)
    assert ann['gt_bboxes_3d'].shape == (1, 7)
    # bottom-center conversion: z = 1.0 - 1.7/2
    np.testing.assert_allclose(ann['gt_bboxes_3d'][0, 2], 1.0 - 0.85,
                               atol=1e-6)

    # geometry consistency: the GT center must project sensibly through
    # lidar2img — recompute the camera-frame point directly
    lidar2img = data['extrinsics'][0]
    center_h = np.array([5.0, 2.0, 1.0, 1.0])
    uvw = lidar2img @ center_h
    # camera at (1, 0, 1.5) rotated +90deg about z: the lidar point maps to
    # cam frame R^T (p - t)
    r = nc.quat_to_mat([np.sqrt(0.5), 0, 0, np.sqrt(0.5)])
    p_cam = r.T @ (np.array([5.0, 2.0, 1.0]) - np.array([1.0, 0.0, 1.5]))
    k = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], float)
    expected = k @ p_cam
    np.testing.assert_allclose(uvw[:3], expected, atol=1e-4)
