"""End-to-end indoor slice: SUN RGB-D dataset -> model -> indoor_eval."""

import os

import numpy as np
import jax
import pytest

from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl
from imvoxelnet_tpu.eval.indoor_eval import indoor_eval
from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict

from test_datasets import sunrgbd_root  # noqa: F401  (fixture)
from test_models import _tiny_indoor_cfg


@pytest.mark.usefixtures('sunrgbd_root')
def test_sunrgbd_end_to_end(sunrgbd_root):  # noqa: F811
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 128),
                                     pad_size=(128, 160))
    dataset = ds.SunRgbdMultiViewDataset(
        sunrgbd_root, os.path.join(sunrgbd_root, 'infos.pkl'),
        ('bed', 'table'), img_cfg, max_gt=8, test_mode=True)

    rng = np.random.RandomState(0)
    batch = dataset.collate([dataset.get_sample(0, train=False, rng=rng)])

    cfg = _tiny_indoor_cfg('sunrgbd', version=1)
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
    metrics = indoor_eval(gt_annos, results, ('bed', 'table'),
                          iou_thrs=(0.25, 0.15))
    assert 'mAP_0.25' in metrics and 'mAP_0.15' in metrics
    for v in metrics.values():
        assert np.isfinite(v)


@pytest.mark.usefixtures('sunrgbd_root')
def test_sunrgbd_gt_as_prediction_full_map(sunrgbd_root):  # noqa: F811
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 128),
                                     pad_size=(128, 160))
    dataset = ds.SunRgbdMultiViewDataset(
        sunrgbd_root, os.path.join(sunrgbd_root, 'infos.pkl'),
        ('bed', 'table'), img_cfg, max_gt=8, test_mode=True)
    ann = dataset.get_ann_info(0)
    gt_annos = [dict(boxes=ann['gt_bboxes_3d'], labels=ann['gt_labels_3d'])]
    results = [dict(boxes=ann['gt_bboxes_3d'],
                    scores=np.full(len(ann['gt_labels_3d']), 0.9),
                    labels=ann['gt_labels_3d'])]
    metrics = indoor_eval(gt_annos, results, ('bed', 'table'),
                          iou_thrs=(0.25,))
    assert abs(metrics['mAP_0.25'] - 1.0) < 1e-6
