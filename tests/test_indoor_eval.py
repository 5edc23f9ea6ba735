import numpy as np

from imvoxelnet_tpu.eval.indoor_eval import (
    average_precision, eval_det_cls, indoor_eval)


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec) - 1.0) < 1e-6


def test_eval_det_cls_perfect_match():
    box = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    pred = {0: (box, np.array([0.9]))}
    gt = {0: box}
    results = eval_det_cls(pred, gt, (0.25, 0.5))
    for recall, precision, ap in results:
        assert abs(ap - 1.0) < 1e-6


def test_eval_det_cls_false_positive():
    gt_box = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    far_box = np.array([[10, 10, 0, 2, 2, 2, 0.0]], np.float32)
    pred = {0: (np.concatenate([gt_box, far_box]), np.array([0.9, 0.95]))}
    gt = {0: gt_box}
    (recall, precision, ap), = eval_det_cls(pred, gt, (0.25,))
    # the higher-scoring far box is a FP: precision dips then recovers
    assert recall[-1] == 1.0
    assert abs(ap - 0.5) < 1e-6


def test_indoor_eval_end_to_end():
    classes = ('chair', 'table')
    gt_annos = [
        dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0],
                             [3, 3, 0, 2, 2, 1, 0.5]], np.float32),
             labels=np.array([0, 1])),
        dict(boxes=np.array([[1, 1, 0, 1, 1, 1, 0]], np.float32),
             labels=np.array([0])),
    ]
    dt_annos = [
        dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0],
                             [3, 3, 0, 2, 2, 1, 0.5]], np.float32),
             scores=np.array([0.9, 0.8]),
             labels=np.array([0, 1])),
        dict(boxes=np.array([[1, 1, 0, 1, 1, 1, 0]], np.float32),
             scores=np.array([0.7]),
             labels=np.array([0])),
    ]
    m = indoor_eval(gt_annos, dt_annos, classes, iou_thrs=(0.25, 0.5))
    assert abs(m['mAP_0.25'] - 1.0) < 1e-6
    assert abs(m['chair_AP_0.50'] - 1.0) < 1e-6
    assert abs(m['mAR_0.25'] - 1.0) < 1e-6


def test_indoor_eval_missed_gt():
    classes = ('chair',)
    gt_annos = [dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0],
                                     [5, 5, 0, 1, 1, 1, 0]], np.float32),
                     labels=np.array([0, 0]))]
    dt_annos = [dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32),
                     scores=np.array([0.9]), labels=np.array([0]))]
    m = indoor_eval(gt_annos, dt_annos, classes, iou_thrs=(0.25,))
    assert abs(m['chair_AP_0.25'] - 0.5) < 1e-6
    assert abs(m['chair_rec_0.25'] - 0.5) < 1e-6
