"""Native C++ eval kernels vs the numpy implementations."""

import numpy as np
import pytest

from imvoxelnet_tpu import native
from imvoxelnet_tpu.eval import kitti_eval as ke

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason='no C++ toolchain')


def test_rect_intersection_matches_numpy():
    rng = np.random.RandomState(0)
    b1 = np.concatenate([rng.uniform(-2, 2, (16, 2)),
                         rng.uniform(0.5, 3, (16, 2)),
                         rng.uniform(-np.pi, np.pi, (16, 1))], 1)
    b2 = np.concatenate([rng.uniform(-2, 2, (12, 2)),
                         rng.uniform(0.5, 3, (12, 2)),
                         rng.uniform(-np.pi, np.pi, (12, 1))], 1)
    got = native.rect_intersection_areas(b1, b2)
    exp = ke._rect_intersection_np(ke._rect_corners(b1), ke._rect_corners(b2))
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_compute_statistics_matches_numpy():
    rng = np.random.RandomState(1)
    n_gt, n_dt = 6, 9
    overlaps = rng.uniform(0, 1, (n_dt, n_gt))
    gt_datas = np.concatenate(
        [rng.uniform(0, 300, (n_gt, 4)), rng.uniform(-3, 3, (n_gt, 1))], 1)
    dt_scores = rng.uniform(0, 1, n_dt)
    dt_datas = np.concatenate(
        [rng.uniform(0, 300, (n_dt, 4)), rng.uniform(-3, 3, (n_dt, 1)),
         dt_scores[:, None]], 1)
    ignored_gt = rng.choice([-1, 0, 1], n_gt)
    ignored_det = rng.choice([-1, 0, 1], n_dt)
    dc = np.zeros((0, 4))
    thresholds = np.sort(rng.uniform(0, 1, 7))[::-1].copy()

    exp_pr = np.zeros((len(thresholds), 4))
    for t, thr in enumerate(thresholds):
        tp, fp, fn, sim, _ = ke.compute_statistics(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc,
            metric=2, min_overlap=0.4, thresh=thr, compute_fp=True,
            compute_aos=True)
        exp_pr[t] += [tp, fp, fn, sim if sim != -1 else 0]

    got_pr = np.zeros((len(thresholds), 4))
    native.compute_statistics_thresholds(
        overlaps, dt_scores, dt_datas[:, 4], gt_datas[:, 4],
        ignored_gt.astype(np.int64), ignored_det.astype(np.int64),
        np.zeros((n_dt, 0)), 0.4, thresholds, 1, got_pr)
    np.testing.assert_allclose(got_pr, exp_pr, atol=1e-9)


def test_native_nms_matches_numpy_greedy():
    import jax.numpy as jnp
    from imvoxelnet_tpu.ops import iou as iou_ops
    from imvoxelnet_tpu.ops import nms as nms_ops

    rng = np.random.RandomState(2)
    n = 24
    boxes = np.concatenate([rng.uniform(0, 8, (n, 2)),
                            rng.uniform(1, 3, (n, 2)),
                            rng.uniform(-1, 1, (n, 1))], 1)
    scores = rng.uniform(0, 1, n)
    keep_native = native.rotated_nms_host(boxes, scores, 0.3)

    iou = iou_ops.rotated_iou_bev(jnp.asarray(boxes, jnp.float32),
                                  jnp.asarray(boxes, jnp.float32))
    keep_jax = np.asarray(nms_ops.greedy_nms_from_iou(
        iou, jnp.asarray(scores, jnp.float32), jnp.ones(n, bool), 0.3))
    np.testing.assert_array_equal(keep_native, keep_jax)
