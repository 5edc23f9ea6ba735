"""Visualization smoke tests (reference ``MultiViewMixin.show`` analog).

Renders wireframes through the real dataset projection path on the synthetic
KITTI fixture and checks the MeshLab .obj export structure.
"""

import os

import numpy as np
import pytest

from imvoxelnet_tpu.data import datasets as ds
from imvoxelnet_tpu.data import pipeline as pl
from imvoxelnet_tpu.utils.visualize import (export_boxes_obj,
                                            show_multi_view_result)

from test_datasets import kitti_root  # noqa: F401  (fixture)

BOXES = np.array([[20.0, 0.0, -1.5, 1.6, 3.9, 1.56, 0.3],
                  [15.0, -3.0, -1.5, 0.6, 0.8, 1.73, -1.2]], np.float32)


@pytest.mark.usefixtures('kitti_root')
def test_show_multi_view_result_writes_pngs(kitti_root, tmp_path):  # noqa: F811
    img_cfg = pl.ImagePipelineConfig(test_scale=(1280, 384),
                                     pad_size=(384, 1280))
    dataset = ds.KittiMultiViewDataset(
        kitti_root, os.path.join(kitti_root, 'kitti_infos_train.pkl'),
        ('Pedestrian', 'Car'), img_cfg, max_gt=8, test_mode=True)
    out_dir = str(tmp_path / 'vis')
    paths = show_multi_view_result(dataset, 0, BOXES, out_dir)
    assert len(paths) == 1  # monocular: one view
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
    import cv2
    img = cv2.imread(paths[0])
    assert img is not None and img.shape[2] == 3


def test_export_boxes_obj_structure(tmp_path):
    path = export_boxes_obj(BOXES, str(tmp_path / 'boxes.obj'))
    lines = open(path).read().strip().splitlines()
    verts = [l for l in lines if l.startswith('v ')]
    edges = [l for l in lines if l.startswith('l ')]
    assert len(verts) == len(BOXES) * 8
    assert len(edges) == len(BOXES) * 12
    # every referenced vertex index is in range (1-based .obj)
    for e in edges:
        _, a, b = e.split()
        assert 1 <= int(a) <= len(verts) and 1 <= int(b) <= len(verts)
