"""Training-signal parity: loss *values* (and KITTI gradients) against
live-torch replicas of the reference's loss stack.

The replicas below re-implement, in torch/numpy, exactly what the reference
composes at train time:

  - KITTI/nuScenes Anchor3DHead: MaxIoUAssigner (nearest-BEV IoU) +
    PseudoSampler + ``anchor_target_3d_single``
    (``mmdet3d/models/dense_heads/train_mixins.py:237-346``), then
    sigmoid-focal / sin-difference-smooth-L1 / direction-CE in
    ``Anchor3DHead.loss_single`` (``anchor3d_head.py:194-373``) with
    ``num_total_samples = sum(max(n_pos_i, 1))``.
  - Indoor v1 heads: FCOS-style ``get_targets``
    (``imvoxel_head.py:344-449`` SunRGBD, ``:469-560`` ScanNet) +
    ``_loss_single`` (``imvoxel_head.py:136-224``): focal cls over valid
    points, centerness BCE over positives (avg ``max(n_pos, 1)`` per image),
    IoU3D / axis-aligned-IoU box loss weighted by centerness targets
    (avg = their sum), each batch-meaned.

The rotated-IoU oracle is an independent Sutherland–Hodgman polygon clip in
numpy (the reference's ``oriented_iou_loss.py:88-110`` z-slab composition on
top), NOT a port of the reference's vertex-sorting kernel.

mmdet reduction semantics replicated: ``weight_reduce_loss`` with
``reduction='mean'`` and an explicit ``avg_factor`` is ``(loss * w).sum() /
avg_factor`` (mmdet 2.x as pinned by the reference).
"""

import math

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.core.target_assign import AssignerConfig
from imvoxelnet_tpu.models.heads import anchor3d_head as ah
from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig
from imvoxelnet_tpu.models.heads import imvoxel_heads as ih
from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig

INF = 1e8


# ---------------------------------------------------------------------------
# mmdet loss primitives (torch replicas)
# ---------------------------------------------------------------------------

def _weight_reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    return loss.sum() / avg_factor


def torch_focal_loss(pred, labels, weight, avg_factor, gamma=2.0, alpha=0.25,
                     loss_weight=1.0):
    """mmdet sigmoid focal loss; ``labels == C`` is background."""
    num_classes = pred.shape[1]
    target = torch.nn.functional.one_hot(
        labels, num_classes + 1)[:, :num_classes].to(pred.dtype)
    p = pred.sigmoid()
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        pred, target, reduction='none') * focal_weight
    if weight is not None:
        weight = weight.view(-1, 1)
    return loss_weight * _weight_reduce(loss, weight, avg_factor)


def torch_smooth_l1(pred, target, weight, avg_factor, beta, loss_weight):
    diff = (pred - target).abs()
    loss = torch.where(diff < beta, 0.5 * diff * diff / beta,
                       diff - 0.5 * beta)
    return loss_weight * _weight_reduce(loss, weight, avg_factor)


def torch_ce(pred, labels, weight, avg_factor, loss_weight):
    loss = torch.nn.functional.cross_entropy(pred, labels, reduction='none')
    return loss_weight * _weight_reduce(loss, weight, avg_factor)


def torch_bce(pred, target, avg_factor, loss_weight=1.0):
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        pred, target, reduction='none')
    return loss_weight * _weight_reduce(loss, None, avg_factor)


# ---------------------------------------------------------------------------
# KITTI / nuScenes: torch target-assignment + loss replica
# ---------------------------------------------------------------------------

def torch_limit_period(val, offset, period):
    return val - torch.floor(val / period + offset) * period


def torch_nearest_bev(boxes):
    """LiDARInstance3DBoxes.nearest_bev (``lidar_box3d.py:93-111``)."""
    bev = boxes[:, [0, 1, 3, 4, 6]]
    rot = torch.abs(torch_limit_period(bev[:, 4], 0.5, math.pi))
    cond = (rot > math.pi / 4)[:, None]
    wh = torch.where(cond, bev[:, [3, 2]], bev[:, 2:4])
    return torch.cat([bev[:, :2] - wh / 2, bev[:, :2] + wh / 2], dim=1)


def torch_bbox_overlaps_2d(b1, b2, eps=1e-6):
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = (a1[:, None] + a2[None, :] - inter).clamp(min=eps)
    return inter / union


def torch_max_iou_assign(anchors, gt, pos_thr, neg_thr, min_pos_iou):
    """mmdet MaxIoUAssigner.assign_wrt_overlaps with gt_max_assign_all=True;
    returns 1-based assigned GT index, 0 = background, -1 = ignore."""
    overlaps = torch_bbox_overlaps_2d(
        torch_nearest_bev(gt), torch_nearest_bev(anchors))    # (G, N)
    n = anchors.shape[0]
    assigned = overlaps.new_full((n,), -1, dtype=torch.long)
    max_overlaps, argmax = overlaps.max(dim=0)
    gt_max_overlaps, _ = overlaps.max(dim=1)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax[pos] + 1
    for i in range(gt.shape[0]):
        if gt_max_overlaps[i] >= min_pos_iou:
            assigned[overlaps[i, :] == gt_max_overlaps[i]] = i + 1
    return assigned


def torch_encode(anchors, boxes):
    """DeltaXYZWLHRBBoxCoder.encode (``delta_xyzwhlr_bbox_coder.py:20-55``)."""
    xa, ya, za, wa, la, ha, ra = anchors.split(1, dim=-1)
    xg, yg, zg, wg, lg, hg, rg = boxes.split(1, dim=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diag = torch.sqrt(la ** 2 + wa ** 2)
    return torch.cat([
        (xg - xa) / diag, (yg - ya) / diag, (zg - za) / ha,
        torch.log(wg / wa), torch.log(lg / la), torch.log(hg / ha),
        rg - ra], dim=-1)


def torch_anchor_targets(anchors, gt, gt_labels, num_classes, assigner,
                         dir_offset):
    """``anchor_target_3d_single`` with PseudoSampler
    (``train_mixins.py:237-316``)."""
    n = anchors.shape[0]
    bbox_targets = torch.zeros_like(anchors)
    bbox_weights = torch.zeros_like(anchors)
    dir_targets = torch.zeros(n, dtype=torch.long)
    dir_weights = torch.zeros(n)
    labels = torch.zeros(n, dtype=torch.long) + num_classes
    label_weights = torch.zeros(n)

    if gt.shape[0] > 0:
        assigned = torch_max_iou_assign(
            anchors, gt, assigner.pos_iou_thr, assigner.neg_iou_thr,
            assigner.min_pos_iou)
        pos_inds = torch.nonzero(assigned > 0).reshape(-1)
        neg_inds = torch.nonzero(assigned == 0).reshape(-1)
    else:
        pos_inds = torch.zeros(0, dtype=torch.long)
        neg_inds = torch.arange(n)

    if len(pos_inds) > 0:
        pos_gt = gt[assigned[pos_inds] - 1]
        pos_anchors = anchors[pos_inds]
        pos_bbox_targets = torch_encode(pos_anchors, pos_gt)
        # get_direction_target (train_mixins.py:320-346, one_hot=False)
        rot_gt = pos_bbox_targets[:, 6] + pos_anchors[:, 6]
        offset_rot = torch_limit_period(rot_gt - dir_offset, 0, 2 * math.pi)
        pos_dir = torch.floor(offset_rot / math.pi).long().clamp(0, 1)
        bbox_targets[pos_inds] = pos_bbox_targets
        bbox_weights[pos_inds] = 1.0
        dir_targets[pos_inds] = pos_dir
        dir_weights[pos_inds] = 1.0
        labels[pos_inds] = gt_labels[assigned[pos_inds] - 1]
        label_weights[pos_inds] = 1.0
    if len(neg_inds) > 0:
        label_weights[neg_inds] = 1.0
    return (labels, label_weights, bbox_targets, bbox_weights, dir_targets,
            dir_weights, len(pos_inds))


def torch_anchor3d_loss(cls_score, bbox_pred, dir_pred, anchors, gts,
                        gt_labels_list, cfg):
    """Batch loss replica of ``Anchor3DHead.loss`` + ``loss_single``
    (``anchor3d_head.py:194-373``); single level, sampling=False."""
    b = cls_score.shape[0]
    per_img = [torch_anchor_targets(anchors, gts[i], gt_labels_list[i],
                                    cfg.num_classes, cfg.assigner,
                                    cfg.dir_offset) for i in range(b)]
    num_total = sum(max(t[6], 1) for t in per_img)

    labels = torch.stack([t[0] for t in per_img]).reshape(-1)
    label_weights = torch.stack([t[1] for t in per_img]).reshape(-1)
    bbox_targets = torch.stack([t[2] for t in per_img]).reshape(-1, 7)
    bbox_weights = torch.stack([t[3] for t in per_img]).reshape(-1, 7)
    dir_targets = torch.stack([t[4] for t in per_img]).reshape(-1)
    dir_weights = torch.stack([t[5] for t in per_img]).reshape(-1)

    cls_flat = cls_score.reshape(-1, cfg.num_classes)
    box_flat = bbox_pred.reshape(-1, 7)
    dir_flat = dir_pred.reshape(-1, 2)

    loss_cls = torch_focal_loss(cls_flat, labels, label_weights, num_total)

    pos_inds = torch.nonzero(
        (labels >= 0) & (labels < cfg.num_classes)).reshape(-1)
    if len(pos_inds) > 0:
        pp, pt = box_flat[pos_inds], bbox_targets[pos_inds]
        pw = bbox_weights[pos_inds]
        sp = torch.sin(pp[:, 6:7]) * torch.cos(pt[:, 6:7])
        st = torch.cos(pp[:, 6:7]) * torch.sin(pt[:, 6:7])
        pp = torch.cat([pp[:, :6], sp], dim=-1)
        pt = torch.cat([pt[:, :6], st], dim=-1)
        loss_bbox = torch_smooth_l1(pp, pt, pw, num_total, beta=1.0 / 9.0,
                                    loss_weight=cfg.loss_bbox_weight)
        loss_dir = torch_ce(dir_flat[pos_inds], dir_targets[pos_inds],
                            dir_weights[pos_inds], num_total,
                            loss_weight=cfg.loss_dir_weight)
    else:
        loss_bbox = box_flat[pos_inds].sum()
        loss_dir = dir_flat[pos_inds].sum()
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dir=loss_dir)


def _kitti_like_cfg(num_classes=1):
    return Anchor3DHeadConfig(
        num_classes=num_classes,
        anchor_ranges=((0, -39.68, -1.78, 69.12 - .32, 39.68 - .32, -1.78),),
        anchor_sizes=((1.6, 3.9, 1.56),), anchor_rotations=(0.0, 1.57),
        dir_offset=0.0, loss_bbox_weight=2.0,
        assigner=AssignerConfig(0.6, 0.45, 0.45))


def _nuscenes_like_cfg():
    return Anchor3DHeadConfig(
        num_classes=1,
        anchor_ranges=((-49.92, -49.92, -1.0, 49.92 - .64, 49.92 - .64,
                        -1.0),),
        anchor_sizes=((1.98, 4.67, 1.74),), anchor_rotations=(0.0, 1.57),
        dir_offset=0.7854, dir_limit_offset=0.0, loss_bbox_weight=1.0,
        assigner=AssignerConfig(0.6, 0.3, 0.3))


def _random_outdoor_batch(cfg, h, w, b, n_gt_per_img, seed=0):
    """Random head outputs + GT with positives near the anchor grid."""
    rng = np.random.RandomState(seed)
    a = cfg.num_anchors
    cls = rng.randn(b, h, w, a * cfg.num_classes).astype(np.float32)
    box = (0.3 * rng.randn(b, h, w, a * 7)).astype(np.float32)
    drc = rng.randn(b, h, w, a * 2).astype(np.float32)

    # GT = perturbed anchors so MaxIoU produces real positives at
    # pos_iou_thr=0.6 (plus looser boxes exercising the low-quality rule)
    anchors = np.asarray(ah.head_anchors((h, w), cfg))
    max_gt = max(max(n_gt_per_img), 1)
    gt_boxes = np.zeros((b, max_gt, 7), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), bool)
    for i, g in enumerate(n_gt_per_img):
        base = anchors[rng.choice(len(anchors), g, replace=False)].copy()
        tight = rng.rand(g) < 0.7
        jitter = np.where(tight[:, None], 0.15, 0.8)
        base[:, :2] += jitter * rng.randn(g, 2)
        base[:, 2] += 0.1 * rng.randn(g)
        base[:, 3:6] *= np.exp(np.where(tight[:, None], 0.05, 0.3)
                               * rng.randn(g, 3))
        base[:, 6] += np.where(tight, 0.1, 1.0) * rng.randn(g)
        gt_boxes[i, :g] = base
        gt_labels[i, :g] = rng.randint(0, cfg.num_classes, g)
        gt_mask[i, :g] = True
    return cls, box, drc, gt_boxes, gt_labels, gt_mask


@pytest.mark.parametrize('cfg_name,n_gt', [
    ('kitti', (5, 3)),
    ('kitti', (4, 0)),          # one empty-GT image
    ('kitti3cls', (6, 2)),      # multi-class focal
    ('nuscenes', (5, 5)),
])
def test_anchor3d_loss_value_parity(cfg_name, n_gt):
    cfg = dict(kitti=_kitti_like_cfg(), kitti3cls=_kitti_like_cfg(3),
               nuscenes=_nuscenes_like_cfg())[cfg_name]
    h, w = 12, 10
    b = len(n_gt)
    seed = dict(kitti=3, kitti3cls=5, nuscenes=9)[cfg_name] + sum(n_gt)
    cls, box, drc, gtb, gtl, gtm = _random_outdoor_batch(
        cfg, h, w, b, n_gt, seed=seed)

    ours = jax.jit(
        lambda *a: ah.anchor3d_head_loss(a[:3], *a[3:], cfg=cfg))(
        cls, box, drc, gtb, gtl, gtm)

    anchors = np.asarray(ah.head_anchors((h, w), cfg))
    gts = [torch.tensor(gtb[i][gtm[i]]) for i in range(b)]
    gls = [torch.tensor(gtl[i][gtm[i]], dtype=torch.long) for i in range(b)]
    theirs = torch_anchor3d_loss(
        torch.tensor(cls), torch.tensor(box), torch.tensor(drc),
        torch.tensor(anchors), gts, gls, cfg)

    # sanity: the batch must have real positives for the test to mean much
    if max(n_gt):
        assert float(theirs['loss_bbox']) > 0
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), rtol=2e-4, atol=1e-6,
            err_msg=f'{cfg_name}: {k}')


def test_anchor3d_loss_grad_parity():
    """Gradients of the total loss w.r.t. all three head outputs match."""
    cfg = _kitti_like_cfg()
    h, w, b = 10, 8, 2
    cls, box, drc, gtb, gtl, gtm = _random_outdoor_batch(
        cfg, h, w, b, (4, 2), seed=7)

    def total(c, bx, d):
        losses = ah.anchor3d_head_loss((c, bx, d), gtb, gtl, gtm, cfg=cfg)
        return losses['loss_cls'] + losses['loss_bbox'] + losses['loss_dir']

    g_jax = jax.jit(jax.grad(total, argnums=(0, 1, 2)))(cls, box, drc)

    anchors = np.asarray(ah.head_anchors((h, w), cfg))
    tc = torch.tensor(cls, requires_grad=True)
    tb = torch.tensor(box, requires_grad=True)
    td = torch.tensor(drc, requires_grad=True)
    gts = [torch.tensor(gtb[i][gtm[i]]) for i in range(b)]
    gls = [torch.tensor(gtl[i][gtm[i]], dtype=torch.long) for i in range(b)]
    losses = torch_anchor3d_loss(tc, tb, td, torch.tensor(anchors), gts, gls,
                                 cfg)
    sum(losses.values()).backward()

    for name, gj, gt_ in (('cls', g_jax[0], tc.grad),
                          ('bbox', g_jax[1], tb.grad),
                          ('dir', g_jax[2], td.grad)):
        gj = np.asarray(gj)
        gt_ = gt_.numpy()
        assert np.abs(gt_).max() > 0, name
        np.testing.assert_allclose(gj, gt_, rtol=1e-3, atol=1e-6,
                                   err_msg=f'grad {name}')


# ---------------------------------------------------------------------------
# Rotated-IoU oracle: Sutherland–Hodgman polygon clip (independent of both
# the reference's vertex-sort kernel and our XLA formulation)
# ---------------------------------------------------------------------------

def _box_corners_2d(box5):
    """(x, y, w, h, alpha) -> (4, 2) CCW corners (box2corners_th layout)."""
    x, y, w, h, a = box5
    local = np.array([[0.5 * w, 0.5 * h], [-0.5 * w, 0.5 * h],
                      [-0.5 * w, -0.5 * h], [0.5 * w, -0.5 * h]])
    rot = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
    return local @ rot + np.array([x, y])


def _sh_clip_area(subject, clip):
    """Intersection area of two convex CCW polygons via Sutherland–Hodgman."""
    poly = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        edge = b - a
        out = []
        n = len(poly)
        for j in range(n):
            p, q = poly[j], poly[(j + 1) % n]
            side_p = np.cross(edge, p - a) >= 0
            side_q = np.cross(edge, q - a) >= 0
            if side_p:
                out.append(p)
            if side_p != side_q:
                d = q - p
                denom = np.cross(edge, d)
                t = np.cross(edge, a - p) / denom
                out.append(p + t * d)
        poly = out
        if not poly:
            return 0.0
    pts = np.asarray(poly)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def np_iou_3d(b1, b2):
    """cal_iou_3d (``oriented_iou_loss.py:88-110``) on gravity-center boxes,
    with the polygon-clip oracle for the BEV intersection."""
    inter_2d = _sh_clip_area(_box_corners_2d(b1[[0, 1, 3, 4, 6]]),
                             _box_corners_2d(b2[[0, 1, 3, 4, 6]]))
    zmax = min(b1[2] + b1[5] / 2, b2[2] + b2[5] / 2)
    zmin = max(b1[2] - b1[5] / 2, b2[2] - b2[5] / 2)
    inter = inter_2d * max(zmax - zmin, 0.0)
    v1 = b1[3] * b1[4] * b1[5]
    v2 = b2[3] * b2[4] * b2[5]
    return inter / (v1 + v2 - inter)


def test_polygon_oracle_axis_aligned():
    a = np.array([0., 0., 0., 2., 2., 2., 0.])
    b = np.array([1., 0., 0., 2., 2., 2., 0.])
    np.testing.assert_allclose(np_iou_3d(a, b), (1 * 2 * 2) / (16 - 4),
                               atol=1e-12)


# ---------------------------------------------------------------------------
# Indoor v1 heads: torch target + loss replica
# ---------------------------------------------------------------------------

def torch_get_points(n_voxels, voxel_size, origin):
    """``get_points`` (``imvoxelnet.py:133-141``)."""
    n_voxels = torch.tensor(n_voxels)
    voxel_size = torch.tensor(voxel_size, dtype=torch.float32)
    origin = torch.tensor(origin, dtype=torch.float32)
    pts = torch.stack(torch.meshgrid(
        torch.arange(n_voxels[0]), torch.arange(n_voxels[1]),
        torch.arange(n_voxels[2]), indexing='ij')).float()
    new_origin = origin - n_voxels / 2.0 * voxel_size
    return pts * voxel_size.view(3, 1, 1, 1) + new_origin.view(3, 1, 1, 1)


def torch_mlvl_points(featmap_sizes, voxel_size, origin):
    pts = []
    for i, size in enumerate(featmap_sizes):
        vs = tuple(v * 2 ** i for v in voxel_size)
        pts.append(torch_get_points(size, vs, origin).reshape(3, -1).T)
    return pts


def torch_compute_centerness(bt):
    x, y, z = bt[..., 0:2], bt[..., 2:4], bt[..., 4:6]
    c = (x.min(-1)[0] / x.max(-1)[0] * y.min(-1)[0] / y.max(-1)[0]
         * z.min(-1)[0] / z.max(-1)[0])
    return torch.sqrt(c)


def _rot_z(points, angles):
    """rotation_3d_in_axis axis=2 (``structures/utils.py:46-55``):
    row-vector points @ [[c,-s,0],[s,c,0],[0,0,1]] per row batch."""
    c, s = torch.cos(angles), torch.sin(angles)
    zeros, ones = torch.zeros_like(c), torch.ones_like(c)
    mat = torch.stack([
        torch.stack([c, -s, zeros], -1),
        torch.stack([s, c, zeros], -1),
        torch.stack([zeros, zeros, ones], -1)], -2)          # (N, 3, 3)
    return torch.einsum('nmj,njk->nmk', points, mat)


def torch_indoor_targets(points_cat, rr_cat, gt, gt_labels, n_classes,
                         topk, with_yaw):
    """v1 ``get_targets`` (``imvoxel_head.py:344-411`` / ``:469-533``).

    ``gt``: (G, 7) bottom-center boxes.  Returns (centerness_t, bbox_t,
    labels) with bbox_t a (P, 7) gravity-center box for sunrgbd or a (P, 6)
    corner box for scannet.
    """
    n_points = points_cat.shape[0]
    g = gt.shape[0]
    gravity = gt.clone()
    gravity[:, 2] = gt[:, 2] + gt[:, 5] / 2
    volumes = (gt[:, 3] * gt[:, 4] * gt[:, 5]).expand(n_points, g).clone()
    boxes_e = gravity[None].expand(n_points, g, 7)
    pts_e = points_cat[:, None, :].expand(n_points, g, 3)

    if with_yaw:
        shift = (pts_e - boxes_e[..., :3]).permute(1, 0, 2)   # (G, P, 3)
        shift = _rot_z(shift, -gravity[:, 6]).permute(1, 0, 2)
        centers = boxes_e[..., :3] + shift
    else:
        centers = pts_e
    dx_min = centers[..., 0] - boxes_e[..., 0] + boxes_e[..., 3] / 2
    dx_max = boxes_e[..., 0] + boxes_e[..., 3] / 2 - centers[..., 0]
    dy_min = centers[..., 1] - boxes_e[..., 1] + boxes_e[..., 4] / 2
    dy_max = boxes_e[..., 1] + boxes_e[..., 4] / 2 - centers[..., 1]
    dz_min = centers[..., 2] - boxes_e[..., 2] + boxes_e[..., 5] / 2
    dz_max = boxes_e[..., 2] + boxes_e[..., 5] / 2 - centers[..., 2]
    face = [dx_min, dx_max, dy_min, dy_max, dz_min, dz_max]
    if with_yaw:
        bt = torch.stack(face + [boxes_e[..., 6]], dim=-1)
    else:
        bt = torch.stack(face, dim=-1)

    inside = bt[..., :6].min(-1)[0] > 0
    max_dist = bt[..., :6].max(-1)[0]
    in_range = (max_dist >= rr_cat[:, None, 0]) & (
        max_dist <= rr_cat[:, None, 1])

    if topk > 0:
        cness = torch_compute_centerness(bt)
        cness = torch.where(inside, cness, torch.full_like(cness, -1))
        cness = torch.where(in_range, cness, torch.full_like(cness, -1))
        top = torch.topk(cness, topk, dim=0).values[-1]
        volumes[(cness > top[None]) == 0] = INF
    volumes[inside == 0] = INF
    volumes[in_range == 0] = INF
    min_vol, min_inds = volumes.min(dim=1)
    labels = gt_labels[min_inds].clone()
    labels[min_vol == INF] = n_classes
    idx = torch.arange(n_points)
    if with_yaw:
        centerness_t = torch_compute_centerness(bt)[idx, min_inds]
        bbox_t = gravity[None].expand(n_points, g, 7)[idx, min_inds]
    else:
        assigned = bt[idx, min_inds]
        centerness_t = torch_compute_centerness(assigned)
        bbox_t = torch.stack([
            points_cat[:, 0] - assigned[:, 0],
            points_cat[:, 1] - assigned[:, 2],
            points_cat[:, 2] - assigned[:, 4],
            points_cat[:, 0] + assigned[:, 1],
            points_cat[:, 1] + assigned[:, 3],
            points_cat[:, 2] + assigned[:, 5]], dim=-1)
    return centerness_t, bbox_t, labels


def torch_sunrgbd_pred_to_bbox(points, bp):
    shift = torch.stack([(bp[:, 1] - bp[:, 0]) / 2,
                         (bp[:, 3] - bp[:, 2]) / 2,
                         (bp[:, 5] - bp[:, 4]) / 2], dim=-1).view(-1, 1, 3)
    shift = _rot_z(shift, bp[:, 6])[:, 0, :]
    center = points + shift
    size = torch.stack([bp[:, 0] + bp[:, 1], bp[:, 2] + bp[:, 3],
                        bp[:, 4] + bp[:, 5]], dim=-1)
    return torch.cat([center, size, bp[:, 6:7]], dim=-1)


def torch_scannet_pred_to_bbox(points, bp):
    return torch.stack([
        points[:, 0] - bp[:, 0], points[:, 1] - bp[:, 2],
        points[:, 2] - bp[:, 4], points[:, 0] + bp[:, 1],
        points[:, 1] + bp[:, 3], points[:, 2] + bp[:, 5]], dim=-1)


def _np_axis_aligned_iou(p, t, eps=1e-6):
    lt = np.maximum(p[:3], t[:3])
    rb = np.minimum(p[3:], t[3:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh.prod()
    v1 = np.clip(p[3:] - p[:3], 0, None).prod()
    v2 = np.clip(t[3:] - t[:3], 0, None).prod()
    return inter / max(v1 + v2 - inter, eps)


def torch_indoor_loss_single(center, bbox, cls, valid, points, rr, gt,
                             gt_labels, cfg):
    """``_loss_single`` (``imvoxel_head.py:136-224``), one image, world=1."""
    centerness_t, bbox_t, labels = torch_indoor_targets(
        points, rr, gt, gt_labels, cfg.n_classes, cfg.centerness_topk,
        cfg.with_yaw)
    pos = (labels < cfg.n_classes) & valid
    pos_inds = torch.nonzero(pos).reshape(-1)
    n_pos = max(float(len(pos_inds)), 1.0)

    loss_cls = torch_focal_loss(cls[valid], labels[valid], None, n_pos)

    if len(pos_inds) > 0:
        pos_c_t = centerness_t[pos_inds]
        loss_center = torch_bce(center[pos_inds], pos_c_t, n_pos)
        if cfg.with_yaw:
            pred = torch_sunrgbd_pred_to_bbox(points[pos_inds],
                                              bbox[pos_inds])
            per = np.array([np_iou_3d(p, t) for p, t in zip(
                pred.detach().numpy().astype(np.float64),
                bbox_t[pos_inds].numpy().astype(np.float64))])
        else:
            pred = torch_scannet_pred_to_bbox(points[pos_inds],
                                              bbox[pos_inds])
            per = np.array([_np_axis_aligned_iou(p, t) for p, t in zip(
                pred.detach().numpy().astype(np.float64),
                bbox_t[pos_inds].numpy().astype(np.float64))])
        w = pos_c_t.numpy().astype(np.float64)
        loss_bbox = float(((1.0 - per) * w).sum() / w.sum())
    else:
        loss_center = center[pos_inds].sum()
        loss_bbox = bbox[pos_inds].sum()
    return float(loss_center), float(loss_bbox), float(loss_cls)


def _indoor_cfg(dataset, topk):
    return IndoorHeadConfig(
        n_classes=4, n_reg_outs=7 if dataset == 'sunrgbd' else 6,
        voxel_size=(.4, .4, .4), dataset=dataset, version=1,
        centerness_topk=topk)


def _random_indoor_batch(cfg, n_voxels, b, n_gt_per_img, seed):
    rng = np.random.RandomState(seed)
    sizes = [tuple(max(1, n // 2 ** i) for n in n_voxels) for i in range(3)]
    centers, bboxes, clses = [], [], []
    for s in sizes:
        centers.append(rng.randn(b, *s, 1).astype(np.float32))
        raw = rng.randn(b, *s, cfg.n_reg_outs).astype(np.float32)
        dist = np.exp(0.4 * raw[..., :6]).astype(np.float32)
        if cfg.with_yaw:
            bp = np.concatenate([dist, raw[..., 6:]], -1)
        else:
            bp = dist
        bboxes.append(bp.astype(np.float32))
        clses.append(rng.randn(b, *s, cfg.n_classes).astype(np.float32))
    # blocky valid mask: resizes identically under torch/jax trilinear
    valid = np.ones((b,) + tuple(n_voxels), bool)
    valid[:, : n_voxels[0] // 2, : n_voxels[1] // 2] = False
    origins = (0.3 * rng.randn(b, 3)).astype(np.float32)

    max_gt = max(n_gt_per_img)
    gt_boxes = np.zeros((b, max_gt, 7), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), bool)
    extent = np.asarray(n_voxels) * np.asarray(cfg.voxel_size)
    for i, g in enumerate(n_gt_per_img):
        c = (rng.rand(g, 3) - 0.5) * extent * 0.7 + origins[i]
        size = np.exp(rng.uniform(np.log(.5), np.log(2.5), (g, 3)))
        yaw = rng.uniform(-np.pi, np.pi, (g, 1)) if cfg.with_yaw \
            else np.zeros((g, 1))
        boxes = np.concatenate([c, size, yaw], 1)
        boxes[:, 2] -= boxes[:, 5] / 2          # bottom-center
        gt_boxes[i, :g] = boxes
        gt_labels[i, :g] = rng.randint(0, cfg.n_classes, g)
        gt_mask[i, :g] = True
    return (centers, bboxes, clses), valid, origins, gt_boxes, gt_labels, \
        gt_mask, sizes


@pytest.mark.parametrize('dataset,topk', [
    ('sunrgbd', -1), ('sunrgbd', 28), ('scannet', -1), ('scannet', 18),
])
def test_indoor_v1_loss_value_parity(dataset, topk):
    cfg = _indoor_cfg(dataset, topk)
    n_voxels = (8, 8, 4)
    b = 2
    (head_outs, valid, origins, gtb, gtl, gtm, sizes) = _random_indoor_batch(
        cfg, n_voxels, b, (6, 3), seed=11 + topk)

    ours = jax.jit(lambda ho, v, o, bx, lb, m: ih.indoor_head_loss(
        ho, v, o, bx, lb, m, cfg))(
        head_outs, valid, origins, gtb, gtl, gtm)

    # torch replica, per image then batch mean (imvoxel_head.py:116-133)
    rr = torch.cat([
        torch.tensor(cfg.regress_ranges[i]).expand(
            int(np.prod(sizes[i])), 2) for i in range(3)])
    per_losses = []
    for i in range(b):
        pts = torch.cat(torch_mlvl_points(sizes, cfg.voxel_size, origins[i]))
        vt = torch.tensor(valid[i][None, None].astype(np.float32))
        valid_lv = [torch.nn.Upsample(size=s, mode='trilinear')(vt)
                    .round().bool().reshape(-1) for s in sizes]
        center = torch.cat([torch.tensor(head_outs[0][lv][i]).reshape(-1)
                            for lv in range(3)])
        bbox = torch.cat([
            torch.tensor(head_outs[1][lv][i]).reshape(-1, cfg.n_reg_outs)
            for lv in range(3)])
        cls = torch.cat([
            torch.tensor(head_outs[2][lv][i]).reshape(-1, cfg.n_classes)
            for lv in range(3)])
        gt = torch.tensor(gtb[i][gtm[i]])
        gl = torch.tensor(gtl[i][gtm[i]], dtype=torch.long)
        per_losses.append(torch_indoor_loss_single(
            center, bbox, cls, torch.cat(valid_lv), pts, rr, gt, gl, cfg))
    theirs = dict(
        loss_centerness=np.mean([p[0] for p in per_losses]),
        loss_bbox=np.mean([p[1] for p in per_losses]),
        loss_cls=np.mean([p[2] for p in per_losses]))

    assert theirs['loss_bbox'] > 0       # nontrivial positives
    for k in ('loss_centerness', 'loss_bbox', 'loss_cls'):
        np.testing.assert_allclose(
            float(ours[k]), theirs[k], rtol=5e-4, atol=2e-5,
            err_msg=f'{dataset} topk={topk}: {k}')


# ---------------------------------------------------------------------------
# Indoor v2 heads (``imvoxel_head_v2.py``): torch target + loss replica.
# Differences from v1 replicated here: the scale-limit assignment (coarsest
# scale holding >= ``limit`` inside-points per box, ``imvoxel_head_v2.py:
# 357-374``), the mandatory ``topk(k + 1)`` centerness rule (:376-381), and
# ``-1`` background labels with positives = ``labels >= 0 & valid`` (:170-184).
# The loss composition itself (focal / BCE / centerness-weighted IoU) is v1's.
# ---------------------------------------------------------------------------

def torch_indoor_targets_v2(points_cat, scales_cat, gt, gt_labels, topk,
                            limit, n_scales, with_yaw):
    """v2 ``get_targets`` (``imvoxel_head_v2.py:322-399`` SunRGBD,
    ``:458-526`` ScanNet).  Returns labels with -1 as background."""
    n_points = points_cat.shape[0]
    g = gt.shape[0]
    gravity = gt.clone()
    gravity[:, 2] = gt[:, 2] + gt[:, 5] / 2
    volumes = (gt[:, 3] * gt[:, 4] * gt[:, 5]).expand(n_points, g).clone()
    boxes_e = gravity[None].expand(n_points, g, 7)
    pts_e = points_cat[:, None, :].expand(n_points, g, 3)

    if with_yaw:
        shift = (pts_e - boxes_e[..., :3]).permute(1, 0, 2)   # (G, P, 3)
        shift = _rot_z(shift, -gravity[:, 6]).permute(1, 0, 2)
        centers = boxes_e[..., :3] + shift
    else:
        centers = pts_e
    dx_min = centers[..., 0] - boxes_e[..., 0] + boxes_e[..., 3] / 2
    dx_max = boxes_e[..., 0] + boxes_e[..., 3] / 2 - centers[..., 0]
    dy_min = centers[..., 1] - boxes_e[..., 1] + boxes_e[..., 4] / 2
    dy_max = boxes_e[..., 1] + boxes_e[..., 4] / 2 - centers[..., 1]
    dz_min = centers[..., 2] - boxes_e[..., 2] + boxes_e[..., 5] / 2
    dz_max = boxes_e[..., 2] + boxes_e[..., 5] / 2 - centers[..., 2]
    face = [dx_min, dx_max, dy_min, dy_max, dz_min, dz_max]
    if with_yaw:
        bt = torch.stack(face + [boxes_e[..., 6]], dim=-1)
    else:
        bt = torch.stack(face, dim=-1)

    inside = bt[..., :6].min(-1)[0] > 0                       # (P, G)

    # condition2: coarsest scale with >= limit positive points per box,
    # via the reference's argmax-with-extra trick (imvoxel_head_v2.py:362-374)
    n_pos_per_scale = torch.stack([
        inside[scales_cat == i].sum(dim=0) for i in range(n_scales)])
    lower_limit_mask = n_pos_per_scale < limit                # (S, G)
    extra = torch.arange(n_scales, 0, -1).unsqueeze(1).expand(n_scales, g)
    lower_index = torch.argmax(lower_limit_mask.int() * extra, dim=0) - 1
    lower_index = torch.where(lower_index < 0,
                              torch.zeros_like(lower_index), lower_index)
    all_upper = torch.all(torch.logical_not(lower_limit_mask), dim=0)
    best_scale = torch.where(
        all_upper, torch.ones_like(lower_index) * (n_scales - 1), lower_index)
    in_best = scales_cat[:, None] == best_scale[None, :]      # (P, G)

    # condition3: strictly above the (k+1)-th centerness
    cness = torch_compute_centerness(bt)
    cness = torch.where(inside, cness, torch.full_like(cness, -1))
    cness = torch.where(in_best, cness, torch.full_like(cness, -1))
    top = torch.topk(cness, topk + 1, dim=0).values[-1]
    in_top = cness > top[None]

    volumes[inside == 0] = INF
    volumes[in_best == 0] = INF
    volumes[in_top == 0] = INF
    min_vol, min_inds = volumes.min(dim=1)
    labels = gt_labels[min_inds].clone()
    labels[min_vol == INF] = -1
    idx = torch.arange(n_points)
    assigned = bt[idx, min_inds]
    centerness_t = torch_compute_centerness(assigned)
    if with_yaw:
        bbox_t = gravity[None].expand(n_points, g, 7)[idx, min_inds]
    else:
        bbox_t = torch_scannet_pred_to_bbox(points_cat, assigned)
    return centerness_t, bbox_t, labels


def torch_indoor_v2_loss_single(center, bbox, cls, valid, points, scales, gt,
                                gt_labels, cfg):
    """``ImVoxelHeadV2._loss_single`` (``imvoxel_head_v2.py:115-203``),
    one image, world=1."""
    centerness_t, bbox_t, labels = torch_indoor_targets_v2(
        points, scales, gt, gt_labels, cfg.centerness_topk, cfg.limit,
        cfg.n_scales, cfg.with_yaw)
    pos = (labels >= 0) & valid
    pos_inds = torch.nonzero(pos).reshape(-1)
    n_pos = max(float(len(pos_inds)), 1.0)

    # mmcv's CUDA focal kernel treats labels outside [0, C) as background;
    # the replica maps -1 -> C for the one-hot
    cls_labels = torch.where(labels >= 0, labels,
                             torch.full_like(labels, cfg.n_classes))
    loss_cls = torch_focal_loss(cls[valid], cls_labels[valid], None, n_pos)

    if len(pos_inds) > 0:
        pos_c_t = centerness_t[pos_inds]
        loss_center = torch_bce(center[pos_inds], pos_c_t, n_pos)
        if cfg.with_yaw:
            pred = torch_sunrgbd_pred_to_bbox(points[pos_inds],
                                              bbox[pos_inds])
            per = np.array([np_iou_3d(p, t) for p, t in zip(
                pred.detach().numpy().astype(np.float64),
                bbox_t[pos_inds].numpy().astype(np.float64))])
        else:
            pred = torch_scannet_pred_to_bbox(points[pos_inds],
                                              bbox[pos_inds])
            per = np.array([_np_axis_aligned_iou(p, t) for p, t in zip(
                pred.detach().numpy().astype(np.float64),
                bbox_t[pos_inds].numpy().astype(np.float64))])
        w = pos_c_t.numpy().astype(np.float64)
        loss_bbox = float(((1.0 - per) * w).sum() / w.sum())
    else:
        loss_center = center[pos_inds].sum()
        loss_bbox = bbox[pos_inds].sum()
    return float(loss_center), float(loss_bbox), float(loss_cls)


def _indoor_v2_cfg(dataset, topk, limit):
    return IndoorHeadConfig(
        n_classes=4, n_reg_outs=7 if dataset == 'sunrgbd' else 6,
        voxel_size=(.4, .4, .4), dataset=dataset, version=2,
        centerness_topk=topk, limit=limit)


@pytest.mark.parametrize('dataset,topk,limit', [
    ('sunrgbd', 18, 27),     # shipped _fast knobs (imvoxelnet_sunrgbd_fast)
    ('sunrgbd', 12, 6),      # low limit: boxes land on coarser scales
    ('scannet', 18, 27),
    ('scannet', 12, 6),
])
def test_indoor_v2_loss_value_parity(dataset, topk, limit):
    cfg = _indoor_v2_cfg(dataset, topk, limit)
    n_voxels = (8, 8, 4)
    b = 2
    (head_outs, valid, origins, gtb, gtl, gtm, sizes) = _random_indoor_batch(
        cfg, n_voxels, b, (6, 3), seed=23 + topk + limit)

    ours = jax.jit(lambda ho, v, o, bx, lb, m: ih.indoor_head_loss(
        ho, v, o, bx, lb, m, cfg))(
        head_outs, valid, origins, gtb, gtl, gtm)

    scales_cat = torch.cat([
        torch.full((int(np.prod(sizes[i])),), i, dtype=torch.long)
        for i in range(3)])
    per_losses = []
    for i in range(b):
        pts = torch.cat(torch_mlvl_points(sizes, cfg.voxel_size, origins[i]))
        vt = torch.tensor(valid[i][None, None].astype(np.float32))
        valid_lv = [torch.nn.Upsample(size=s, mode='trilinear')(vt)
                    .round().bool().reshape(-1) for s in sizes]
        center = torch.cat([torch.tensor(head_outs[0][lv][i]).reshape(-1)
                            for lv in range(3)])
        bbox = torch.cat([
            torch.tensor(head_outs[1][lv][i]).reshape(-1, cfg.n_reg_outs)
            for lv in range(3)])
        cls = torch.cat([
            torch.tensor(head_outs[2][lv][i]).reshape(-1, cfg.n_classes)
            for lv in range(3)])
        gt = torch.tensor(gtb[i][gtm[i]])
        gl = torch.tensor(gtl[i][gtm[i]], dtype=torch.long)
        per_losses.append(torch_indoor_v2_loss_single(
            center, bbox, cls, torch.cat(valid_lv), pts, scales_cat, gt, gl,
            cfg))
    theirs = dict(
        loss_centerness=np.mean([p[0] for p in per_losses]),
        loss_bbox=np.mean([p[1] for p in per_losses]),
        loss_cls=np.mean([p[2] for p in per_losses]))

    assert theirs['loss_bbox'] > 0       # nontrivial positives
    for k in ('loss_centerness', 'loss_bbox', 'loss_cls'):
        np.testing.assert_allclose(
            float(ours[k]), theirs[k], rtol=5e-4, atol=2e-5,
            err_msg=f'{dataset} v2 topk={topk} limit={limit}: {k}')


def test_indoor_v2_scale_assignment_nontrivial():
    """Guard: the low-limit v2 case really exercises condition2 (some GT
    assigned to a scale > 0), otherwise the parametrization above would
    silently only test the v1-equivalent path."""
    cfg = _indoor_v2_cfg('scannet', 12, 6)
    n_voxels = (8, 8, 4)
    (_, _, origins, gtb, gtl, gtm, sizes) = _random_indoor_batch(
        cfg, n_voxels, 2, (6, 3), seed=23 + 12 + 6)
    scales_cat = torch.cat([
        torch.full((int(np.prod(sizes[i])),), i, dtype=torch.long)
        for i in range(3)])
    best_scales = []
    for i in range(2):
        pts = torch.cat(torch_mlvl_points(sizes, cfg.voxel_size, origins[i]))
        gt = torch.tensor(gtb[i][gtm[i]])
        _, _, labels = torch_indoor_targets_v2(
            pts, scales_cat, gt, torch.tensor(gtl[i][gtm[i]],
                                              dtype=torch.long),
            cfg.centerness_topk, cfg.limit, cfg.n_scales, cfg.with_yaw)
        best_scales.append(scales_cat[labels >= 0])
    assigned_scales = torch.cat(best_scales)
    assert (assigned_scales > 0).any(), \
        'test fixture never leaves scale 0 — raise box sizes or lower limit'


# ---------------------------------------------------------------------------
# LayoutHead (Total3D): loss replica (``layout_head.py:78-106``)
# ---------------------------------------------------------------------------

def torch_layout_loss(angles, layouts, gt_angles, gt_layouts_bc,
                      angle_weight=100.0, layout_weight=1.0):
    """Per-image sin-difference SmoothL1 (pitch + roll) + IoU3D layout loss,
    batch-meaned; weights from ``imvoxelnet_total_sunrgbd.py:13-19``."""
    b = angles.shape[0]
    angle_losses, layout_losses = [], []
    for i in range(b):
        a, g = angles[i], gt_angles[i]
        losses = []
        for j in range(2):
            p = torch.sin(a[j]) * torch.cos(g[j])
            t = torch.cos(a[j]) * torch.sin(g[j])
            d = (p - t).abs()
            sl1 = torch.where(d < 1.0, 0.5 * d * d, d - 0.5)
            losses.append(angle_weight * sl1)
        angle_losses.append(losses[0] + losses[1])
        gt_gc = gt_layouts_bc[i].clone()
        gt_gc[2] = gt_gc[2] + gt_gc[5] / 2
        iou = np_iou_3d(layouts[i].numpy().astype(np.float64),
                        gt_gc.numpy().astype(np.float64))
        layout_losses.append(layout_weight * (1.0 - iou))
    return (float(torch.stack(angle_losses).mean()),
            float(np.mean(layout_losses)))


def test_layout_head_loss_value_parity():
    from imvoxelnet_tpu.models.heads.layout_head import (LayoutHeadConfig,
                                                         layout_head_loss)
    rng = np.random.RandomState(4)
    b = 5
    angles = (0.4 * rng.randn(b, 2)).astype(np.float32)
    gt_angles = (angles + 0.3 * rng.randn(b, 2)).astype(np.float32)
    # gravity-center predicted layouts overlapping bottom-center GT rooms
    gt_layouts = np.concatenate([
        0.5 * rng.randn(b, 2), np.zeros((b, 1)),
        np.exp(rng.uniform(np.log(2.0), np.log(5.0), (b, 3))),
        rng.uniform(-np.pi, np.pi, (b, 1))], axis=1).astype(np.float32)
    layouts = gt_layouts.copy()
    layouts[:, 2] += gt_layouts[:, 5] / 2            # to gravity center
    layouts[:, :3] += 0.4 * rng.randn(b, 3).astype(np.float32)
    layouts[:, 3:6] *= np.exp(0.2 * rng.randn(b, 3)).astype(np.float32)
    layouts[:, 6] += 0.3 * rng.randn(b).astype(np.float32)

    cfg = LayoutHeadConfig()
    ours = jax.jit(lambda a, l, ga, gl: layout_head_loss(a, l, ga, gl, cfg))(
        angles, layouts, gt_angles, gt_layouts)

    t_angle, t_layout = torch_layout_loss(
        torch.tensor(angles), torch.tensor(layouts),
        torch.tensor(gt_angles), torch.tensor(gt_layouts),
        cfg.loss_angle_weight, cfg.loss_layout_weight)
    assert t_layout > 0.01                    # nontrivial IoU mismatch
    np.testing.assert_allclose(float(ours['angle_loss']), t_angle,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(ours['layout_loss']), t_layout,
                               rtol=5e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Indoor gradient parity.  Needs a *differentiable* torch IoU3D oracle: the
# same Sutherland–Hodgman clip as the numpy oracle above, in torch autograd
# (dynamic python lists of tensors — slow, fine at test scale).
# ---------------------------------------------------------------------------

def _cross2(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _t_box_corners_2d(box5):
    x, y, w, h, a = box5[0], box5[1], box5[2], box5[3], box5[4]
    ca, sa = torch.cos(a), torch.sin(a)
    pts = []
    for sx, sy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        lx, ly = sx * w, sy * h
        pts.append(torch.stack([lx * ca - ly * sa + x, lx * sa + ly * ca + y]))
    return pts


def _t_sh_clip_area(subject, clip):
    poly = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        edge = b - a
        out = []
        n = len(poly)
        for j in range(n):
            p, q = poly[j], poly[(j + 1) % n]
            side_p = float(_cross2(edge, p - a)) >= 0
            side_q = float(_cross2(edge, q - a)) >= 0
            if side_p:
                out.append(p)
            if side_p != side_q:
                d = q - p
                t = _cross2(edge, a - p) / _cross2(edge, d)
                out.append(p + t * d)
        poly = out
        if not poly:
            return subject[0].sum() * 0.0
    area = subject[0].sum() * 0.0
    n = len(poly)
    for j in range(n):
        area = area + _cross2(poly[j], poly[(j + 1) % n])
    return 0.5 * area.abs()


def torch_iou_3d_diff(b1, b2):
    """Differentiable ``cal_iou_3d`` (gravity-center 7-DoF boxes)."""
    inter_2d = _t_sh_clip_area(
        _t_box_corners_2d(b1[[0, 1, 3, 4, 6]]),
        _t_box_corners_2d(b2[[0, 1, 3, 4, 6]]))
    zmax = torch.min(b1[2] + b1[5] / 2, b2[2] + b2[5] / 2)
    zmin = torch.max(b1[2] - b1[5] / 2, b2[2] - b2[5] / 2)
    inter = inter_2d * torch.clamp(zmax - zmin, min=0.0)
    v1 = b1[3] * b1[4] * b1[5]
    v2 = b2[3] * b2[4] * b2[5]
    return inter / (v1 + v2 - inter)


def _t_axis_aligned_iou(p, t, eps=1e-6):
    lt = torch.max(p[:3], t[:3])
    rb = torch.min(p[3:], t[3:])
    wh = torch.clamp(rb - lt, min=0.0)
    inter = wh.prod()
    v1 = torch.clamp(p[3:] - p[:3], min=0.0).prod()
    v2 = torch.clamp(t[3:] - t[:3], min=0.0).prod()
    return inter / torch.clamp(v1 + v2 - inter, min=eps)


def torch_indoor_loss_single_diff(center, bbox, cls, valid, points, rr, gt,
                                  gt_labels, cfg):
    """Differentiable clone of ``torch_indoor_loss_single`` (v1 targets)."""
    centerness_t, bbox_t, labels = torch_indoor_targets(
        points, rr, gt, gt_labels, cfg.n_classes, cfg.centerness_topk,
        cfg.with_yaw)
    pos = (labels < cfg.n_classes) & valid
    pos_inds = torch.nonzero(pos).reshape(-1)
    n_pos = max(float(len(pos_inds)), 1.0)

    loss_cls = torch_focal_loss(cls[valid], labels[valid], None, n_pos)
    pos_c_t = centerness_t[pos_inds]
    loss_center = torch_bce(center[pos_inds], pos_c_t, n_pos)
    if cfg.with_yaw:
        pred = torch_sunrgbd_pred_to_bbox(points[pos_inds], bbox[pos_inds])
        per = torch.stack([torch_iou_3d_diff(pred[i], bbox_t[pos_inds][i])
                           for i in range(len(pos_inds))])
    else:
        pred = torch_scannet_pred_to_bbox(points[pos_inds], bbox[pos_inds])
        per = torch.stack([_t_axis_aligned_iou(pred[i], bbox_t[pos_inds][i])
                           for i in range(len(pos_inds))])
    w = pos_c_t
    loss_bbox = ((1.0 - per) * w).sum() / w.sum()
    return loss_center, loss_bbox, loss_cls


def test_torch_diff_oracle_matches_numpy():
    rng = np.random.RandomState(2)
    for _ in range(20):
        b1 = np.concatenate([rng.randn(3), np.exp(0.3 * rng.randn(3)) + 0.3,
                             rng.uniform(-np.pi, np.pi, 1)])
        b2 = b1 + np.concatenate([0.4 * rng.randn(3), 0.2 * rng.randn(3),
                                  0.4 * rng.randn(1)])
        np.testing.assert_allclose(
            float(torch_iou_3d_diff(torch.tensor(b1), torch.tensor(b2))),
            np_iou_3d(b1, b2), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('dataset', ['sunrgbd', 'scannet'])
def test_indoor_v1_loss_grad_parity(dataset):
    """d(total loss)/d(head outputs) matches the torch replica — extends the
    KITTI-family gradient parity to the indoor loss stack (incl. gradients
    through the rotated-IoU clip for sunrgbd)."""
    cfg = _indoor_cfg(dataset, -1)
    n_voxels = (6, 6, 4)
    b = 2
    (head_outs, valid, origins, gtb, gtl, gtm, sizes) = _random_indoor_batch(
        cfg, n_voxels, b, (4, 2), seed=31)

    def total(ho):
        losses = ih.indoor_head_loss(ho, valid, origins, gtb, gtl, gtm, cfg)
        return losses['loss_centerness'] + losses['loss_bbox'] + \
            losses['loss_cls']

    g_jax = jax.jit(jax.grad(total))(head_outs)

    # torch side: per-image losses on leaf tensors with requires_grad
    rr = torch.cat([
        torch.tensor(cfg.regress_ranges[i]).expand(
            int(np.prod(sizes[i])), 2) for i in range(3)])
    t_center = [torch.tensor(head_outs[0][lv], requires_grad=True)
                for lv in range(3)]
    t_bbox = [torch.tensor(head_outs[1][lv], requires_grad=True)
              for lv in range(3)]
    t_cls = [torch.tensor(head_outs[2][lv], requires_grad=True)
             for lv in range(3)]
    per = []
    for i in range(b):
        pts = torch.cat(torch_mlvl_points(sizes, cfg.voxel_size, origins[i]))
        vt = torch.tensor(valid[i][None, None].astype(np.float32))
        valid_lv = [torch.nn.Upsample(size=s, mode='trilinear')(vt)
                    .round().bool().reshape(-1) for s in sizes]
        center = torch.cat([t_center[lv][i].reshape(-1) for lv in range(3)])
        bbox = torch.cat([t_bbox[lv][i].reshape(-1, cfg.n_reg_outs)
                          for lv in range(3)])
        cls = torch.cat([t_cls[lv][i].reshape(-1, cfg.n_classes)
                         for lv in range(3)])
        gt = torch.tensor(gtb[i][gtm[i]])
        gl = torch.tensor(gtl[i][gtm[i]], dtype=torch.long)
        per.append(torch_indoor_loss_single_diff(
            center, bbox, cls, torch.cat(valid_lv), pts, rr, gt, gl, cfg))
    total_t = sum(torch.stack([p[k] for p in per]).mean() for k in range(3))
    total_t.backward()

    for name, gj_lv, gt_lv in (('center', g_jax[0], t_center),
                               ('bbox', g_jax[1], t_bbox),
                               ('cls', g_jax[2], t_cls)):
        # a level with no positives has a legitimately zero grad (center /
        # bbox flow only through positive points); require signal overall
        assert max(float(np.abs(g.grad.numpy()).max()) for g in gt_lv) > 0, \
            name
        for lv in range(3):
            gj = np.asarray(gj_lv[lv])
            gt_ = gt_lv[lv].grad.numpy()
            np.testing.assert_allclose(
                gj, gt_, rtol=2e-3, atol=1e-6,
                err_msg=f'{dataset} grad {name} level {lv}')
