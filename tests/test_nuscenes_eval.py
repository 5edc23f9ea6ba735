import numpy as np

from imvoxelnet_tpu.eval.nuscenes_eval import nuscenes_nds, simple_nuscenes_ap


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


# ---------------------------------------------------------------------------
# Devkit-free NDS goldens (all expected values hand-derived from the official
# algorithm, nuscenes-devkit eval/detection/{algo,evaluate}.py)
# ---------------------------------------------------------------------------

def _annos(gt_rows, dt_rows, scores):
    gt = [dict(boxes=np.asarray(gt_rows, np.float32),
               labels=np.zeros(len(gt_rows), np.int64))]
    dt = [dict(boxes=np.asarray(dt_rows, np.float32),
               labels=np.zeros(len(dt_rows), np.int64),
               scores=np.asarray(scores, np.float32))]
    return gt, dt


def test_nds_perfect():
    """Exact detections: every AP = 1 (precision 1 on the whole clipped
    grid), all TP errors 0, so NDS = (5*1 + 3*1) / 8 = 1."""
    rows = [[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3],
            [10.0, -3.0, 0.0, 1.8, 4.2, 1.4, -0.7]]
    gt, dt = _annos(rows, rows, [0.9, 0.8])
    m = nuscenes_nds(gt, dt)
    np.testing.assert_allclose(m['mAP'], 1.0, atol=1e-12)
    assert m['car_ATE'] == 0.0 and m['car_ASE'] == 0.0 and m['car_AOE'] == 0.0
    np.testing.assert_allclose(m['NDS'], 1.0, atol=1e-12)


def test_nds_no_detections():
    """No detections: AP = 0 everywhere, TP errors take the devkit's 1.0
    sentinel, so each (1 - min(1, err)) term is 0 and NDS = 0."""
    gt, dt = _annos([[0.0, 0, 0, 2, 4, 1.5, 0]], np.zeros((0, 7)), [])
    m = nuscenes_nds(gt, dt)
    assert m['mAP'] == 0.0
    assert m['car_ATE'] == 1.0 and m['car_ASE'] == 1.0 and m['car_AOE'] == 1.0
    assert m['NDS'] == 0.0


def test_nds_known_tp_errors():
    """Fixed, analytically known errors on a single always-matched box:

    - translation offset 0.5 m  -> matched at thresholds 1/2/4 but NOT 0.5
      (strict <), so mAP = (0 + 1 + 1 + 1) / 4 = 0.75;
    - gt size (2, 4, 1.5) vs dt size (1, 4, 1.5): centered aligned IoU =
      min-volume/union = (1*4*1.5)/(2*4*1.5) = 0.5 -> ASE = 0.5;
    - yaw off by pi/2 -> AOE = pi/2;
    - NDS = (5*0.75 + (1-0.5) + (1-0.5) + (1-min(1, pi/2))) / 8 = 4.75/8.
    """
    gt, dt = _annos([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0]],
                    [[0.5, 0.0, 0.0, 1.0, 4.0, 1.5, np.pi / 2]], [0.9])
    m = nuscenes_nds(gt, dt)
    assert m['car_AP_dist_0.5'] == 0.0
    np.testing.assert_allclose(m['car_AP_dist_1.0'], 1.0, atol=1e-12)
    np.testing.assert_allclose(m['mAP'], 0.75, atol=1e-12)
    np.testing.assert_allclose(m['car_ATE'], 0.5, atol=1e-12)
    np.testing.assert_allclose(m['car_ASE'], 0.5, atol=1e-7)
    np.testing.assert_allclose(m['car_AOE'], np.pi / 2, atol=1e-7)
    np.testing.assert_allclose(m['NDS'], (5 * 0.75 + 0.5 + 0.5) / 8.0,
                               atol=1e-7)


def test_nds_interpolation_golden():
    """Pins the 101-point interpolation + 10%/10% clipping with a closed-form
    case: 1 GT, an FP scored above the single TP.

    cum curves: rec = [0, 1], prec = [0, 0.5].  Interpolated precision on the
    grid is 0.005k at index k; calc_ap averages indices 11..100 of
    max(0, 0.005k - 0.1) and divides by 0.9:
      sum_{k=20}^{100} (0.005k - 0.1) = 0.005 * 4860 - 8.1 = 16.2
      AP = (16.2 / 90) / 0.9 = 0.2  exactly.
    """
    gt, dt = _annos([[0.0, 0, 0, 2, 4, 1.5, 0]],
                    [[50.0, 0, 0, 2, 4, 1.5, 0],    # FP, higher score
                     [0.0, 0, 0, 2, 4, 1.5, 0]],    # TP
                    [0.9, 0.5])
    m = nuscenes_nds(gt, dt)
    np.testing.assert_allclose(m['car_AP_dist_2.0'], 0.2, atol=1e-12)


def test_nds_yaw_period_wraps():
    """orient error uses the smallest difference under the 2*pi period:
    yaw 3.1 vs -3.1 differs by 0.2*pi-ish wrap, not 6.2."""
    gt, dt = _annos([[0.0, 0, 0, 2, 4, 1.5, 3.1]],
                    [[0.0, 0, 0, 2, 4, 1.5, -3.1]], [0.9])
    m = nuscenes_nds(gt, dt)
    np.testing.assert_allclose(m['car_AOE'], 2 * np.pi - 6.2, atol=1e-6)


def test_nds_greedy_matching_consumes_gt():
    """Two detections near one GT: the higher-scored one takes it; the other
    becomes an FP even though it is within threshold."""
    gt, dt = _annos([[0.0, 0, 0, 2, 4, 1.5, 0]],
                    [[0.2, 0, 0, 2, 4, 1.5, 0],
                     [0.1, 0, 0, 2, 4, 1.5, 0]],
                    [0.9, 0.8])
    m = nuscenes_nds(gt, dt)
    # recall hits 1.0 at the first det (prec 1), second is FP at rec 1.0;
    # interpolated precision stays 1 on (0, 1] except the duplicate knot
    assert m['car_AP_dist_2.0'] > 0.98
    np.testing.assert_allclose(m['car_ATE'], 0.2, atol=1e-7)


def test_nds_velocity_optional():
    rows = [[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3]]
    gt = [dict(boxes=np.asarray(rows, np.float32), labels=np.zeros(1),
               velocities=np.array([[1.0, 0.0]]))]
    dt = [dict(boxes=np.asarray(rows, np.float32), labels=np.zeros(1),
               scores=np.array([0.9]), velocities=np.array([[0.0, 0.0]]))]
    m = nuscenes_nds(gt, dt, with_velocity=True)
    np.testing.assert_allclose(m['car_AVE'], 1.0, atol=1e-7)
    # NDS renormalizes over 4 TP metrics: (5*1 + 1 + 1 + 1 + 0) / 9
    np.testing.assert_allclose(m['NDS'], 8.0 / 9.0, atol=1e-7)
