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


# ---------------------------------------------------------------------------
# Reference goldens (lifted from /root/reference/tests/test_indoor_eval.py —
# CUDA-gated there only because box.overlaps calls the GPU kernel; the values
# are protocol constants)
# ---------------------------------------------------------------------------

def test_indoor_eval_reference_golden():
    boxes = np.array([
        [-2.4089e-03, -3.3174e+00, 4.9438e-01, 2.1668e+00, 2.8431e-01, 1.6506e+00, 0.0],
        [-3.4269e-01, -2.7565e+00, 2.8144e-02, 6.8554e-01, 9.6854e-01, 6.1755e-01, 0.0],
        [-3.8320e+00, -1.0646e+00, 1.7074e-01, 2.4981e-01, 4.4708e-01, 6.2538e-01, 0.0],
        [4.1073e-01, 3.3757e+00, 3.4311e-01, 8.0617e-01, 2.8679e-01, 1.6060e+00, 0.0],
        [6.1199e-01, -3.1041e+00, 4.1873e-01, 1.2310e+00, 4.0162e-01, 1.7303e+00, 0.0],
        [-5.9877e-01, -2.6011e+00, 1.1148e+00, 1.5704e-01, 7.5957e-01, 9.6930e-01, 0.0],
        [2.7462e-01, -3.0088e+00, 6.5231e-02, 8.1208e-01, 4.1861e-01, 3.7339e-01, 0.0],
        [-1.4704e+00, -2.0024e+00, 2.7479e-01, 1.7888e+00, 1.0566e+00, 1.3704e+00, 0.0],
        [8.2727e-02, -3.1160e+00, 2.5690e-01, 1.4054e+00, 2.0772e-01, 9.6792e-01, 0.0],
        [2.6896e+00, 1.9881e+00, 1.1566e+00, 9.9885e-02, 3.5713e-01, 4.5638e-01, 0.0],
    ], np.float32)
    det = [dict(
        boxes=boxes,
        labels=np.array([0, 1, 2, 2, 0, 3, 1, 2, 3, 2]),
        scores=np.array([1.7516e-05, 1.0167e-06, 8.4486e-07, 7.1048e-02,
                         6.4274e-05, 1.5003e-07, 5.8102e-06, 1.9399e-08,
                         5.3126e-07, 1.8630e-09]))]
    gt = [dict(boxes=boxes, labels=np.array([0, 1, 2, 0, 0, 3, 1, 3, 3, 2]))]
    classes = ('cabinet', 'bed', 'chair', 'sofa')
    m = indoor_eval(gt, det, classes, (0.25, 0.5))
    assert np.isclose(m['cabinet_AP_0.25'], 0.666667, atol=1e-5)
    assert np.isclose(m['bed_AP_0.25'], 1.0, atol=1e-5)
    assert np.isclose(m['chair_AP_0.25'], 0.5, atol=1e-5)
    assert np.isclose(m['mAP_0.25'], 0.708333, atol=1e-5)
    assert np.isclose(m['mAR_0.25'], 0.833333, atol=1e-5)


def test_indoor_eval_less_classes_reference_golden():
    det = [dict(boxes=np.array([[1., 1, 1, 1, 1, 1, 1]], np.float32),
                labels=np.array([0]), scores=np.array([.5])),
           dict(boxes=np.array([[1., 1, 1, 1, 1, 1, 1]], np.float32),
                labels=np.array([1]), scores=np.array([.5]))]
    gt = [dict(boxes=np.array([[0., 0, 0, 1, 1, 1, 1],
                               [1., 1, 1, 1, 1, 1, 1]], np.float32),
               labels=np.array([2, 0])),
          dict(boxes=np.array([[1., 1, 1, 1, 1, 1, 1]], np.float32),
               labels=np.array([1]))]
    m = indoor_eval(gt, det, ('cabinet', 'bed', 'chair'), (0.25, 0.5))
    assert np.isclose(m['mAP_0.25'], 0.666667, atol=1e-5)
    assert np.isclose(m['mAR_0.25'], 0.666667, atol=1e-5)


def test_layout_ious():
    """Total3D layout_iou metric (``sunrgbd_monocular_dataset.py:141-148``):
    aligned rotated-3D IoU between predicted layouts (gravity-center) and
    stored GT layouts (origin (.5, .5, .5) == gravity-center z)."""
    from imvoxelnet_tpu.eval.runner import layout_ious

    # identical boxes -> IoU 1, including a rotated one
    pred = np.array([[1.0, 2.0, 1.5, 4.0, 5.0, 3.0, 0.3],
                     [0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    np.testing.assert_allclose(layout_ious(pred, pred), [1.0, 1.0], atol=1e-5)

    # axis-aligned unit shift: BEV inter 1x2, z fully shared (same gravity
    # z + same h) -> 4 / (8 + 8 - 4) = 1/3
    gt = pred.copy()
    gt[1, 0] += 1.0
    ious = layout_ious(pred, gt)
    np.testing.assert_allclose(ious[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ious[1], 1.0 / 3.0, atol=1e-5)
