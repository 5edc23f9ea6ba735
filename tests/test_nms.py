import numpy as np
import jax.numpy as jnp

from imvoxelnet_tpu.ops import iou as iou_ops
from imvoxelnet_tpu.ops import nms as nms_ops


def _numpy_greedy_nms(iou, scores, valid, thr):
    order = np.argsort(-np.where(valid, scores, -1e10), kind='stable')
    keep = np.zeros(len(scores), bool)
    suppressed = np.zeros(len(scores), bool)
    for pos, i in enumerate(order):
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in order[pos + 1:]:
            if iou[i, j] > thr:
                suppressed[j] = True
    return keep


def test_greedy_nms_matches_numpy():
    rng = np.random.RandomState(0)
    n = 32
    centers = rng.uniform(0, 10, (n, 2))
    whr = np.concatenate([rng.uniform(1, 3, (n, 2)), rng.uniform(-1, 1, (n, 1))], 1)
    boxes = jnp.asarray(np.concatenate([centers, whr], 1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    valid = jnp.ones(n, bool)

    iou = np.asarray(iou_ops.rotated_iou_bev(boxes, boxes))
    got = np.asarray(nms_ops.greedy_nms_from_iou(
        jnp.asarray(iou), scores, valid, 0.3))
    exp = _numpy_greedy_nms(iou, np.asarray(scores), np.asarray(valid), 0.3)
    np.testing.assert_array_equal(got, exp)


def test_nms_respects_validity():
    boxes = jnp.asarray([[0, 0, 2, 2, 0], [0, 0, 2, 2, 0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep = np.asarray(nms_ops.rotated_nms_bev(
        boxes, scores, jnp.asarray([False, True]), 0.5))
    np.testing.assert_array_equal(keep, [False, True])


def test_aligned_3d_nms_class_aware():
    # identical boxes, different classes -> both kept
    boxes = jnp.asarray([[0, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1])
    keep = np.asarray(nms_ops.aligned_3d_nms(
        boxes, scores, classes, jnp.ones(2, bool), 0.25))
    np.testing.assert_array_equal(keep, [True, True])
    # same class -> the lower-scoring one is suppressed
    keep2 = np.asarray(nms_ops.aligned_3d_nms(
        boxes, scores, jnp.asarray([0, 0]), jnp.ones(2, bool), 0.25))
    np.testing.assert_array_equal(keep2, [True, False])


def test_multiclass_nms_3d_basic():
    # two overlapping boxes of class 0, one separate box of class 1
    boxes7 = jnp.asarray([
        [0, 0, 0, 2, 2, 2, 0],
        [0.1, 0, 0, 2, 2, 2, 0],
        [10, 10, 0, 2, 2, 2, 0],
    ], jnp.float32)
    bev = boxes7[:, jnp.asarray([0, 1, 3, 4, 6])]
    scores = jnp.asarray([
        [0.9, 0.0],
        [0.8, 0.0],
        [0.0, 0.7],
    ], jnp.float32)
    out = nms_ops.multiclass_nms_3d(
        boxes7, bev, scores, jnp.ones(3, bool),
        score_thr=0.1, max_num=8, iou_thr=0.3, pre_nms_k=3)
    valid = np.asarray(out['valid'])
    assert valid.sum() == 2
    kept_scores = np.sort(np.asarray(out['scores'])[valid])[::-1]
    np.testing.assert_allclose(kept_scores, [0.9, 0.7], atol=1e-6)
    labels = np.asarray(out['labels'])[valid]
    assert set(labels.tolist()) == {0, 1}


def test_fixpoint_nms_suppression_chains():
    """The parallel fixpoint must reproduce greedy on suppression chains."""
    n = 10
    iou = np.zeros((n, n))
    for i in range(n - 1):
        iou[i, i + 1] = iou[i + 1, i] = 0.9
    scores = jnp.asarray(np.linspace(1, 0.1, n))
    keep = np.asarray(nms_ops.greedy_nms_from_iou(
        jnp.asarray(iou), scores, jnp.ones(n, bool), 0.5))
    np.testing.assert_array_equal(keep, [i % 2 == 0 for i in range(n)])
