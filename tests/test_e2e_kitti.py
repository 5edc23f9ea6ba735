"""End-to-end KITTI slice: dataset -> model -> predictions -> protocol eval.

Exercises the full tools/test.py path in-process on a synthetic fixture with
a tiny model (random weights: the protocol must run and produce finite
metrics; detection quality is asserted separately by the overfit tests)."""

import os
import pickle

import numpy as np
import jax
import pytest

from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl
from imvoxelnet_tpu.eval.kitti_eval import convert_to_kitti_annos, kitti_eval
from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict

from test_datasets import kitti_root  # noqa: F401  (fixture)
from test_models import _tiny_kitti_cfg


@pytest.mark.usefixtures('kitti_root')
def test_kitti_end_to_end(kitti_root):  # noqa: F811
    img_cfg = pl.ImagePipelineConfig(test_scale=(320, 96),
                                     pad_size=(96, 320))
    dataset = ds.KittiMultiViewDataset(
        kitti_root, os.path.join(kitti_root, 'kitti_infos_train.pkl'),
        ('Pedestrian',), img_cfg, max_gt=8, test_mode=True)

    rng = np.random.RandomState(0)
    sample = dataset.get_sample(0, train=False, rng=rng)
    batch = dataset.collate([sample])

    cfg = _tiny_kitti_cfg()
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs = model.apply(variables, batch, train=False)
    pred = jax.device_get(imvoxelnet_predict(cfg, *outs, batch))

    valid = pred['valid'][0]
    results = [dict(boxes=pred['boxes'][0][valid],
                    scores=pred['scores'][0][valid],
                    labels=pred['labels'][0][valid])]
    dt_annos = convert_to_kitti_annos(results, dataset.data_infos,
                                      ('Pedestrian',))
    gt_annos = [info['annos'] for info in dataset.data_infos]
    metrics = kitti_eval(gt_annos, dt_annos, ['Pedestrian'],
                         eval_types=('bbox', 'bev', '3d'))
    assert 'KITTI/Pedestrian_3D_moderate' in metrics
    for v in metrics.values():
        assert np.isfinite(v)


@pytest.mark.usefixtures('kitti_root')
def test_kitti_eval_with_injected_gt_prediction(kitti_root):  # noqa: F811
    """Feeding the GT itself as the prediction must give perfect easy AP."""
    infos = pickle.load(open(
        os.path.join(kitti_root, 'kitti_infos_train.pkl'), 'rb'))
    info = infos[0]
    rect = info['calib']['R0_rect'].astype(np.float32)
    trv2c = info['calib']['Tr_velo_to_cam'].astype(np.float32)
    ann = info['annos']
    keep = ann['name'] != 'DontCare'
    loc = ann['location'][keep]
    dims = ann['dimensions'][keep]
    rots = ann['rotation_y'][keep]
    rt = np.linalg.inv(rect @ trv2c)
    xyz = np.concatenate([loc, np.ones((len(loc), 1))], 1) @ rt.T
    lidar = np.concatenate([xyz[:, :3], dims[:, [2, 0, 1]],
                            (rots + np.pi)[:, None]], 1).astype(np.float32)
    results = [dict(boxes=lidar, scores=np.full(len(lidar), 0.9),
                    labels=np.zeros(len(lidar), np.int64))]
    dt_annos = convert_to_kitti_annos(results, infos, ('Pedestrian',))
    metrics = kitti_eval([info['annos']], dt_annos, ['Pedestrian'],
                         eval_types=('3d',))
    # single GT, perfect match: 11-point AP floor is 100/11 ~ 9.09
    assert metrics['KITTI/Pedestrian_3D_easy'] > 9.0
