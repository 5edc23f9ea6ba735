"""End-to-end Total3D slice: dataset -> layout-head model -> eval runner.

Covers the last graph family without an e2e test: the
``SunRgbdTotalMultiViewDataset`` (angles + layout GT, ``_flip.jpg``
convention), the detector with ``LayoutHead``, and the runner's Total3D
metric branch (mAP@0.15 + pitch/roll MAE + ``layout_iou`` — reference
``sunrgbd_monocular_dataset.py:103-151``).
"""

import os
import pickle

import numpy as np
import jax
import pytest

from imvoxelnet_tpu.configs import presets as presets_mod
from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl
from imvoxelnet_tpu.eval import runner
from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict

from test_datasets import _write_png
from test_models import _tiny_indoor_cfg


@pytest.fixture()
def total_root(tmp_path):
    root = str(tmp_path / 'sunrgbd_total')
    _write_png(os.path.join(root, 'image/000001.jpg'), 106, 146)
    k = np.array([[105.9, 0, 0], [0, 105.9, 0], [73, 53, 1]])  # column-major
    infos = [dict(
        image=dict(image_idx=1, image_path='image/000001.jpg',
                   image_shape=np.array([106, 146], np.int32)),
        calib=dict(K=k.reshape(-1), Rt=np.eye(3)),
        annos=dict(
            gt_num=2,
            gt_boxes_upright_depth=np.array(
                [[0.5, 2.0, 0.2, 1.0, 0.8, 0.9, 0.3],
                 [-0.5, 3.0, 0.0, 2.0, 1.0, 0.7, -0.2]]),
            **{'class': np.array([0, 1])},
            name=np.array(['bed', 'table']),
        ),
        angles=np.array([0.1, 0.05], np.float32),
        layout=np.array([0.0, 3.0, 1.4, 6.0, 5.0, 2.8, 0.2], np.float32),
    )]
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    return root


def _tiny_total_preset():
    cfg = _tiny_indoor_cfg('sunrgbd', version=1, layout=True)
    return presets_mod.Preset(
        name='imvoxelnet_total_sunrgbd_tiny', model=cfg,
        data=presets_mod.DataConfig(dataset='sunrgbd',
                                    classes=('bed', 'table')))


def test_total3d_end_to_end(total_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 128),
                                     pad_size=(128, 160))
    dataset = ds.SunRgbdTotalMultiViewDataset(
        total_root, os.path.join(total_root, 'infos.pkl'),
        ('bed', 'table'), img_cfg, max_gt=8, test_mode=True)

    rng = np.random.RandomState(0)
    sample = dataset.get_sample(0, train=False, rng=rng)
    assert sample['gt_angles'].shape == (2,)
    assert sample['gt_layout'].shape == (7,)
    batch = dataset.collate([sample])

    preset = _tiny_total_preset()
    cfg = preset.model
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs = model.apply(variables, batch, train=False)
    pred = jax.device_get(imvoxelnet_predict(cfg, *outs, batch))
    assert 'angles' in pred and 'layout' in pred

    valid = pred['valid'][0]
    results = [dict(boxes=pred['boxes'][0][valid],
                    scores=pred['scores'][0][valid],
                    labels=pred['labels'][0][valid],
                    angles=pred['angles'][0],
                    layout=pred['layout'][0])]
    metrics = runner.evaluate_results(
        preset, 'imvoxelnet_total_sunrgbd_tiny', dataset, results)
    for key in ('mAP_0.15', 'pitch_mae', 'roll_mae', 'layout_iou'):
        assert key in metrics and np.isfinite(metrics[key]), key


def test_total3d_gt_as_prediction_perfect_metrics(total_root):
    img_cfg = pl.ImagePipelineConfig(test_scale=(160, 128),
                                     pad_size=(128, 160))
    dataset = ds.SunRgbdTotalMultiViewDataset(
        total_root, os.path.join(total_root, 'infos.pkl'),
        ('bed', 'table'), img_cfg, max_gt=8, test_mode=True)
    info = dataset.data_infos[0]
    ann = dataset.get_ann_info(0)
    results = [dict(boxes=ann['gt_bboxes_3d'],
                    scores=np.full(len(ann['gt_labels_3d']), 0.9),
                    labels=ann['gt_labels_3d'],
                    angles=info['angles'],
                    # stored layout origin (.5,.5,.5) == gravity center
                    layout=info['layout'])]
    metrics = runner.evaluate_results(
        _tiny_total_preset(), 'imvoxelnet_total_sunrgbd_tiny', dataset,
        results)
    assert abs(metrics['mAP_0.15'] - 1.0) < 1e-6
    assert abs(metrics['pitch_mae']) < 1e-6
    assert abs(metrics['roll_mae']) < 1e-6
    assert abs(metrics['layout_iou'] - 1.0) < 1e-5
