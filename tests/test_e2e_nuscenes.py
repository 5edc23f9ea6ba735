"""End-to-end nuScenes slice: 6-camera dataset -> DCN model -> NDS protocol.

Mirrors the KITTI/indoor e2e slices: a synthetic 6-camera fixture runs
through ``NuScenesMultiViewDataset`` (origin ``(0, 0, -1)`` + range filter),
a tiny anchor-head model with DCN stages 3-4 (the nuScenes backbone shape),
``imvoxelnet_predict``, and the devkit-semantics ``nuscenes_nds`` metrics.
"""

import os
import pickle

import numpy as np
import jax
import pytest

from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl
from imvoxelnet_tpu.eval.nuscenes_eval import nuscenes_nds
from imvoxelnet_tpu.models.detector import (
    ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_predict)
from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig

from test_datasets import _write_png


@pytest.fixture()
def small_nuscenes_root(tmp_path):
    """6-camera nuScenes infos with small images (e2e-model-sized)."""
    root = str(tmp_path / 'nuscenes')
    cams = {}
    for i, cam in enumerate(ds.NuScenesMultiViewDataset.CAMERAS):
        path = f'samples/{cam}/0.jpg'
        _write_png(os.path.join(root, path), 90, 160, seed=i)
        theta = i * np.pi / 3
        rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                        [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
        cams[cam] = dict(
            data_path=path,
            cam_intrinsic=np.array([[126.0, 0, 80.0],
                                    [0, 126.0, 45.0], [0, 0, 1.0]]),
            sensor2lidar_rotation=rot,
            sensor2lidar_translation=np.array([0.1 * i, 0.0, 1.5]),
        )
    infos = dict(infos=[dict(
        cams=cams,
        gt_boxes=np.array([
            [1.0, 0.5, -1.0, 1.9, 4.6, 1.7, 0.3],     # in range
            [80.0, 5.0, 0.0, 1.9, 4.6, 1.7, 0.3],     # x > 49.92 -> dropped
        ], np.float32),
        gt_names=np.array(['car', 'car']),
        num_lidar_pts=np.array([10, 10]),
    )], metadata=dict(version='v1.0-mini'))
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def _tiny_nuscenes_cfg():
    head = Anchor3DHeadConfig(
        num_classes=1,
        anchor_ranges=((-3, -3, -1.0, 3, 3, -1.0),),
        nms_pre=64, max_out=8)
    return ImVoxelNetConfig(
        n_voxels=(16, 16, 12), voxel_size=(0.4, 0.4, 0.4),
        fpn_out_channels=16,
        neck=NeckConfig(kind='nuscenes', in_channels=16, out_channels=32),
        head_kind='anchor3d', anchor_head=head,
        stage_with_dcn=(False, False, True, True))


def test_nuscenes_end_to_end(small_nuscenes_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 90),
                                     pad_size=(96, 160))
    dataset = ds.NuScenesMultiViewDataset(
        small_nuscenes_root, os.path.join(small_nuscenes_root, 'infos.pkl'),
        ('car',), img_cfg, n_images=6, max_gt=8, test_mode=True)

    rng = np.random.RandomState(0)
    batch = dataset.collate([dataset.get_sample(0, train=False, rng=rng)])
    assert batch['images'].shape == (1, 6, 96, 160, 3)

    cfg = _tiny_nuscenes_cfg()
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs = model.apply(variables, batch, train=False)
    pred = jax.device_get(imvoxelnet_predict(cfg, *outs, batch))

    valid = pred['valid'][0]
    results = [dict(boxes=pred['boxes'][0][valid],
                    scores=pred['scores'][0][valid],
                    labels=pred['labels'][0][valid])]
    ann = dataset.get_ann_info(0)
    gt_annos = [dict(boxes=ann['gt_bboxes_3d'], labels=ann['gt_labels_3d'])]
    metrics = nuscenes_nds(gt_annos, results, ('car',))
    assert 'car_AP_dist_2.0' in metrics and 'mAP' in metrics and 'NDS' in metrics
    for v in metrics.values():
        assert np.isfinite(v)


def test_nuscenes_gt_as_prediction_perfect_nds(small_nuscenes_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 90),
                                     pad_size=(96, 160))
    dataset = ds.NuScenesMultiViewDataset(
        small_nuscenes_root, os.path.join(small_nuscenes_root, 'infos.pkl'),
        ('car',), img_cfg, n_images=6, max_gt=8, test_mode=True)
    ann = dataset.get_ann_info(0)
    gt_annos = [dict(boxes=ann['gt_bboxes_3d'], labels=ann['gt_labels_3d'])]
    results = [dict(boxes=ann['gt_bboxes_3d'],
                    scores=np.full(len(ann['gt_labels_3d']), 0.9),
                    labels=ann['gt_labels_3d'])]
    metrics = nuscenes_nds(gt_annos, results, ('car',))
    assert abs(metrics['mAP'] - 1.0) < 1e-6
    assert abs(metrics['NDS'] - 1.0) < 1e-6
