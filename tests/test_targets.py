"""Semantic tests for target assignment (indoor FCOS-style + MaxIoU)."""

import numpy as np
import jax.numpy as jnp

from imvoxelnet_tpu.core.target_assign import (AssignerConfig,
                                               anchor_targets_single,
                                               get_direction_target,
                                               max_iou_assign)
from imvoxelnet_tpu.models.heads.imvoxel_heads import (IndoorHeadConfig,
                                                       indoor_targets)


def _points_grid(n=8, extent=4.0):
    lin = np.linspace(-extent, extent, n)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing='ij')
    return jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)


def _cfg(dataset='sunrgbd', version=1, topk=-1, limit=4):
    return IndoorHeadConfig(
        n_classes=3, n_reg_outs=7 if dataset == 'sunrgbd' else 6,
        voxel_size=(1.0, 1.0, 1.0), dataset=dataset, version=version,
        centerness_topk=topk, limit=limit,
        regress_ranges=((-1.0, 1e8),) * 3)


def test_indoor_targets_center_point_max_centerness():
    pts = _points_grid(n=9)   # odd n -> the grid contains the exact origin
    # box centered exactly on a grid point
    box = jnp.asarray([[0.0, 0.0, -1.0, 2.0, 2.0, 2.0, 0.0]])  # gc at z=0
    labels = jnp.asarray([1])
    mask = jnp.ones(1, bool)
    scales = jnp.zeros(pts.shape[0], jnp.int32)
    rr = jnp.broadcast_to(jnp.asarray([[-1.0, 1e8]]), (pts.shape[0], 2))
    cness, bbox_t, lab = indoor_targets(pts, scales, rr, box, labels, mask,
                                        _cfg())
    center_idx = int(np.argmin(np.linalg.norm(np.asarray(pts), axis=1)))
    assert float(cness[center_idx]) > 0.99
    assert int(lab[center_idx]) == 1
    # points far outside are background
    far_idx = int(np.argmax(np.linalg.norm(np.asarray(pts), axis=1)))
    assert int(lab[far_idx]) == -1
    # assigned target is the gravity-center box
    np.testing.assert_allclose(np.asarray(bbox_t[center_idx]),
                               [0, 0, 0, 2, 2, 2, 0], atol=1e-6)


def test_indoor_targets_min_volume_tiebreak():
    pts = jnp.asarray([[0.0, 0.0, 0.0]])
    boxes = jnp.asarray([
        [0.0, 0.0, -2.0, 4.0, 4.0, 4.0, 0.0],   # big
        [0.0, 0.0, -1.0, 2.0, 2.0, 2.0, 0.0],   # small -> wins
    ])
    labels = jnp.asarray([0, 2])
    cness, bbox_t, lab = indoor_targets(
        pts, jnp.zeros(1, jnp.int32),
        jnp.asarray([[-1.0, 1e8]]), boxes, labels, jnp.ones(2, bool), _cfg())
    assert int(lab[0]) == 2


def test_indoor_targets_yaw_rotation():
    """A point inside a rotated box but outside its AABB-aligned twin."""
    yaw = np.pi / 4
    box = jnp.asarray([[0.0, 0.0, -0.5, 4.0, 0.6, 1.0, yaw]])
    # a point on the box's local +x axis: under the reference's row-vector
    # rotate-by-(-yaw), world (p cos yaw, -p sin yaw) maps to local (p, 0)
    p = 1.5
    pt_in = jnp.asarray([[p * np.cos(yaw), -p * np.sin(yaw), 0.0]],
                        jnp.float32)
    cfg = _cfg()
    cness, _, lab = indoor_targets(
        pt_in, jnp.zeros(1, jnp.int32), jnp.asarray([[-1.0, 1e8]]),
        box, jnp.asarray([1]), jnp.ones(1, bool), cfg)
    assert int(lab[0]) == 1, 'point on the rotated axis must be inside'


def test_indoor_targets_topk_limits_positives():
    # jitter the grid so centerness values have no exact ties (with ties the
    # strictly-greater comparison — same as the reference — drops whole
    # symmetric groups)
    rng = np.random.RandomState(0)
    pts = _points_grid(n=10, extent=2.0)
    pts = pts + jnp.asarray(rng.uniform(-0.05, 0.05, pts.shape), jnp.float32)
    box = jnp.asarray([[0.0, 0.0, -2.0, 4.0, 4.0, 4.0, 0.0]])
    k = 5
    cfg = _cfg(topk=k)
    _, _, lab = indoor_targets(
        pts, jnp.zeros(pts.shape[0], jnp.int32),
        jnp.broadcast_to(jnp.asarray([[-1.0, 1e8]]), (pts.shape[0], 2)),
        box, jnp.asarray([0]), jnp.ones(1, bool), cfg)
    n_pos = int(np.sum(np.asarray(lab) >= 0))
    assert 0 < n_pos <= k  # strictly-greater comparison -> at most k-1 usually


def test_indoor_targets_v2_scale_choice():
    """v2 picks the coarsest scale with >= limit positive points."""
    # 2 scales: fine has 64 points in the box, coarse has 8
    fine = _points_grid(n=8, extent=1.4)       # inside 3x3x3 box: all 512? no
    coarse = _points_grid(n=2, extent=1.0)
    pts = jnp.concatenate([fine, coarse])
    scales = jnp.concatenate([jnp.zeros(fine.shape[0], jnp.int32),
                              jnp.ones(coarse.shape[0], jnp.int32)])
    box = jnp.asarray([[0.0, 0.0, -2.0, 4.0, 4.0, 4.0, 0.0]])
    cfg = IndoorHeadConfig(
        n_classes=2, n_reg_outs=6, voxel_size=(1, 1, 1), dataset='scannet',
        version=2, n_scales=2, centerness_topk=1000, limit=4)
    _, _, lab = indoor_targets(pts, scales, None, box, jnp.asarray([0]),
                               jnp.ones(1, bool), cfg)
    lab = np.asarray(lab)
    # coarse scale has 8 >= limit=4 points inside -> it is chosen (index 1);
    # no fine-scale point may be positive
    assert np.all(lab[:fine.shape[0]] == -1)
    assert np.sum(lab[fine.shape[0]:] == 0) > 0


def test_max_iou_assign_thresholds():
    anchors = jnp.asarray([
        [0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0],    # on the gt
        [1.0, 0.5, -1.0, 1.6, 3.9, 1.56, 0.0],    # partial overlap
        [30.0, 30.0, -1.0, 1.6, 3.9, 1.56, 0.0],  # no overlap
    ])
    gt = jnp.asarray([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]])
    out = max_iou_assign(anchors, gt, jnp.ones(1, bool),
                         AssignerConfig(0.6, 0.45, 0.45))
    out = np.asarray(out)
    assert out[0] == 0      # IoU 1.0 -> positive
    assert out[2] == -1     # background


def test_max_iou_assign_low_quality_match():
    """A GT whose best anchor is below pos_thr still claims it (min_pos_iou)."""
    anchors = jnp.asarray([
        [0.4, 0.5, -1.0, 1.6, 3.9, 1.56, 0.0],
        [30.0, 30.0, -1.0, 1.6, 3.9, 1.56, 0.0],
    ])
    gt = jnp.asarray([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]])
    from imvoxelnet_tpu.ops import iou as iou_ops
    iou = float(iou_ops.bbox_overlaps_nearest_3d(anchors, gt)[0, 0])
    assert 0.45 < iou < 0.6  # the interesting band
    out = np.asarray(max_iou_assign(anchors, gt, jnp.ones(1, bool),
                                    AssignerConfig(0.6, 0.45, 0.45)))
    assert out[0] == 0


def test_direction_target_bins():
    yaw = jnp.asarray([0.1, np.pi + 0.1, -0.1, 2 * np.pi + 0.2])
    bins = np.asarray(get_direction_target(jnp.zeros(4), yaw))
    np.testing.assert_array_equal(bins, [0, 1, 1, 0])


def test_anchor_targets_single_shapes():
    anchors = jnp.asarray(np.random.RandomState(0).uniform(
        -5, 5, (20, 7)).astype(np.float32))
    anchors = anchors.at[:, 3:6].set(jnp.abs(anchors[:, 3:6]) + 1)
    gt = jnp.asarray([[0.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.2]])
    t = anchor_targets_single(anchors, gt, jnp.asarray([0]),
                              jnp.ones(1, bool), AssignerConfig(),
                              num_classes=1)
    assert t['labels'].shape == (20,)
    assert t['bbox_targets'].shape == (20, 7)
    assert int(t['n_pos']) >= 1


def test_delta_coder_roundtrip_and_semantics():
    """DeltaXYZWLHRBBoxCoder: encode/decode inverse + diagonal normalisation
    and gravity-z referencing (delta_xyzwhlr_bbox_coder.py:20-90)."""
    from imvoxelnet_tpu.core import coder
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(np.concatenate(
        [rng.uniform(-10, 10, (16, 3)), rng.uniform(1, 4, (16, 3)),
         rng.uniform(-3, 3, (16, 1))], 1), jnp.float32)
    boxes = jnp.asarray(np.concatenate(
        [rng.uniform(-10, 10, (16, 3)), rng.uniform(1, 4, (16, 3)),
         rng.uniform(-3, 3, (16, 1))], 1), jnp.float32)
    deltas = coder.encode(anchors, boxes)
    decoded = coder.decode(anchors, deltas)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(boxes),
                               rtol=1e-4, atol=1e-4)
    # identical box -> zero deltas
    z = coder.encode(anchors, anchors)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-6)
    # xy offsets normalised by the BEV diagonal
    a = jnp.asarray([[0., 0., 0., 3., 4., 2., 0.]])
    b = jnp.asarray([[5., 0., 0., 3., 4., 2., 0.]])
    d = np.asarray(coder.encode(a, b))[0]
    np.testing.assert_allclose(d[0], 5.0 / 5.0, atol=1e-6)  # diag = 5
    # z offset referenced at the gravity center and normalised by height
    b2 = jnp.asarray([[0., 0., 1., 3., 4., 2., 0.]])
    d2 = np.asarray(coder.encode(a, b2))[0]
    np.testing.assert_allclose(d2[2], 0.5, atol=1e-6)
