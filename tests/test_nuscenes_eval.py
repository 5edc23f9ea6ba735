import numpy as np

from imvoxelnet_tpu.eval.nuscenes_eval import simple_nuscenes_ap


def test_perfect_detection_full_ap():
    box = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3]])
    gt = [dict(boxes=box)]
    dt = [dict(boxes=box, scores=np.array([0.9]))]
    m = simple_nuscenes_ap(gt, dt)
    assert m['car_AP'] > 0.99


def test_missed_and_false_positive():
    gt = [dict(boxes=np.array([[0.0, 0, 0, 2, 4, 1.5, 0],
                               [20.0, 0, 0, 2, 4, 1.5, 0]]))]
    dt = [dict(boxes=np.array([[0.1, 0, 0, 2, 4, 1.5, 0],
                               [50.0, 0, 0, 2, 4, 1.5, 0]]),
               scores=np.array([0.9, 0.8]))]
    m = simple_nuscenes_ap(gt, dt)
    # one of two GTs found -> recall caps at 0.5
    assert 0.0 < m['car_AP'] < 0.6


def test_distance_thresholds_monotonic():
    gt = [dict(boxes=np.array([[0.0, 0, 0, 2, 4, 1.5, 0]]))]
    dt = [dict(boxes=np.array([[1.5, 0, 0, 2, 4, 1.5, 0]]),
               scores=np.array([0.9]))]
    m = simple_nuscenes_ap(gt, dt)
    # offset 1.5m: misses 0.5/1.0 thresholds, hits 2.0/4.0
    assert m['AP_dist_0.5'] == 0.0 and m['AP_dist_1.0'] == 0.0
    assert m['AP_dist_2.0'] > 0.9 and m['AP_dist_4.0'] > 0.9
