"""Anchor-free FCOS-style indoor 3D heads (SUN RGB-D / ScanNet, v1 + v2).

Reimplements, fixed-shape and batch-vmapped:
  - ``ImVoxelHead`` / ``SunRgbdImVoxelHead`` / ``ScanNetImVoxelHead``
    (``mmdet3d/models/dense_heads/imvoxel_head.py``)
  - ``ImVoxelHeadV2`` variants (``imvoxel_head_v2.py``) with the v2/v3
    scale assignment: coarsest scale holding >= ``limit`` positive points
    per box (``imvoxel_head_v2.py:357-374``) and mandatory centerness-topk.

Everything that was per-sample python looping + boolean indexing in the
reference becomes dense ``(n_points, n_boxes)`` masked tensors over a padded
GT axis, vmapped over the batch — the natural TPU formulation.

Feature layout is channel-last ``(B, nx, ny, nz, C)``; flattening order
``(nx, ny, nz)`` matches the reference's ``permute(1, 2, 3, 0).reshape(-1)``
and the ``get_points`` meshgrid ordering.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops
from ...ops import losses as loss_ops
from ...ops import nms as nms_ops
from ...ops.backproject import get_points

INF = 1e8


@dataclasses.dataclass(frozen=True)
class IndoorHeadConfig:
    n_classes: int
    n_reg_outs: int  # 7 for SUN RGB-D (with yaw), 6 for ScanNet
    voxel_size: Tuple[float, float, float]
    dataset: str = 'sunrgbd'        # 'sunrgbd' | 'scannet'
    version: int = 1                # 1 (towers+regress ranges) | 2 (scale limit)
    n_convs: int = 0                # v1 tower depth (0 in all shipped configs)
    n_scales: int = 3
    centerness_topk: int = -1       # v1: optional (_top27 -> 28/18); v2: required
    limit: int = 27                 # v2 scale-assignment threshold
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1.0, 0.75), (0.75, 1.5), (1.5, INF))
    # test cfg
    nms_pre: int = 1000
    score_thr: float = 0.05
    iou_thr: float = 0.15           # rotated nms_thr (sunrgbd) / aligned iou_thr
    # fixed-size detection output; the reference caps at max_num = nms_pre
    max_out: int = 1000
    # static per-class candidate cap for the rotated NMS.  <= 0 selects the
    # exact shared-IoU-matrix path (``multiclass_nms_3d_exact``) with no
    # truncation — bit-identical to the reference's box3d_multiclass_nms over
    # all nms_pre * n_scales candidates; a positive value keeps only the
    # top-k by score per class (measured divergence documented in
    # docs/parity.md, tests/test_nms.py::test_truncation_bound)
    pre_nms_k: int = 256

    @property
    def with_yaw(self) -> bool:
        return self.dataset == 'sunrgbd'


class Scale(nn.Module):
    """Learnable scalar (mmcv ``Scale``)."""

    @nn.compact
    def __call__(self, x):
        s = self.param('scale', nn.initializers.ones, ())
        return x * s


class _Kernel(nn.Module):
    """Bias-free 3x3x3 conv kernel holder: declares the SAME param path as
    the ``nn.Conv`` it replaces (``<name>/kernel``, same shape, same
    normal(0.01) init as ``_conv3`` and the reference's
    ``normal_init(std=.01)``, imvoxel_head.py:74-75) but returns the kernel
    instead of running its own convolution, letting the head fuse several
    prediction heads into ONE lane-padded conv (see
    ``IndoorHead.__call__``)."""

    out_feats: int
    @nn.compact
    def __call__(self, in_feats):
        return self.param('kernel', nn.initializers.normal(0.01),
                          (3, 3, 3, in_feats, self.out_feats))


def _conv3(feats, use_bias, name, dtype=jnp.float32):
    return nn.Conv(feats, (3, 3, 3), padding=((1, 1),) * 3, use_bias=use_bias,
                   kernel_init=nn.initializers.normal(0.01), dtype=dtype,
                   name=name)


def _cls_bias_init(key, shape, dtype=jnp.float32):
    # bias_init_with_prob(0.01) = -log((1 - p) / p)
    return jnp.full(shape, -4.59511985013459, dtype)


class IndoorHead(nn.Module):
    """Shared-weight multi-scale head; returns channel-last level lists.

    Outputs are cast back to float32 — losses, decodes and NMS stay exact
    even when the conv path runs in bf16.
    """

    cfg: IndoorHeadConfig
    axis_name: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        cfg = self.cfg
        xs = [x.astype(self.dtype) for x in xs]
        n_channels = xs[0].shape[-1]
        # shared convs applied to every level; per-level learnable Scale
        reg_tower = []
        cls_tower = []
        if cfg.version == 1:
            for j in range(cfg.n_convs):
                reg_tower.append((
                    _conv3(n_channels, False, f'reg_tower_{j}', self.dtype),
                    nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f'reg_tower_bn_{j}')))
                cls_tower.append((
                    _conv3(n_channels, False, f'cls_tower_{j}', self.dtype),
                    nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f'cls_tower_bn_{j}')))
        # centerness and reg predictions consume the SAME feature map in
        # both head versions (v1: the reg tower output; v2: x directly), so
        # their two bias-free convs fuse into ONE conv of 1 + n_reg_outs
        # output channels.  The MXU pads output channels to 128 lanes
        # either way, so separate tiny-C_out convs each pay the full padded
        # cost: the round-5 SUN RGB-D v1 trace measured the three final
        # prediction convs at 7.4 ms EACH on the finest (80x80x32) level at
        # <10 TF/s.  Per-output-channel conv math is independent, so the
        # fused conv is numerically identical; params keep the reference
        # names/shapes via _Kernel.  (cls_conv stays separate: different
        # input in v1, and it carries a bias + focal prior init.)
        centerness_kernel = _Kernel(1, name='centerness_conv')(n_channels)
        reg_kernel = _Kernel(cfg.n_reg_outs, name='reg_conv')(n_channels)
        fused_kernel = jnp.concatenate(
            [centerness_kernel, reg_kernel], axis=-1).astype(self.dtype)

        def center_reg_conv(feat):
            out = jax.lax.conv_general_dilated(
                feat, fused_kernel, window_strides=(1, 1, 1),
                padding=((1, 1),) * 3,
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            return out[..., :1], out[..., 1:]
        cls_conv = nn.Conv(
            cfg.n_classes, (3, 3, 3), padding=((1, 1),) * 3,
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            bias_init=_cls_bias_init, name='cls_conv')
        level_scales = [Scale(name=f'scale_{i}') for i in range(len(xs))]

        centernesses, bbox_preds, cls_scores = [], [], []
        for i, x in enumerate(xs):
            reg_feat, cls_feat = x, x
            if cfg.version == 1:
                for (rc, rbn), (cc, cbn) in zip(reg_tower, cls_tower):
                    reg_feat = nn.relu(rbn(rc(reg_feat)))
                    cls_feat = nn.relu(cbn(cc(cls_feat)))
            # centerness input == reg input in both versions (v1: tower
            # output, imvoxel_head.py:72-76; v2: x, imvoxel_head_v2.py:57)
            centerness, reg_final = center_reg_conv(reg_feat)
            centerness = centerness.astype(jnp.float32)
            reg_final = reg_final.astype(jnp.float32)
            scale = level_scales[i]
            if cfg.with_yaw:
                distance = jnp.exp(scale(reg_final[..., :6]))
                bbox_pred = jnp.concatenate([distance, reg_final[..., 6:]], -1)
            else:
                bbox_pred = jnp.exp(scale(reg_final))
            cls_score = cls_conv(cls_feat).astype(jnp.float32)

            centernesses.append(centerness)
            bbox_preds.append(bbox_pred)
            cls_scores.append(cls_score)
        return centernesses, bbox_preds, cls_scores


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------

def compute_centerness(bbox_targets):
    """sqrt of per-axis min/max products (``imvoxel_head.py:563-571``)."""
    x = bbox_targets[..., 0:2]
    y = bbox_targets[..., 2:4]
    z = bbox_targets[..., 4:6]
    c = (x.min(-1) / jnp.maximum(x.max(-1), 1e-12)
         * y.min(-1) / jnp.maximum(y.max(-1), 1e-12)
         * z.min(-1) / jnp.maximum(z.max(-1), 1e-12))
    return jnp.sqrt(jnp.clip(c, 0.0))


def sunrgbd_bbox_pred_to_bbox(points, bbox_pred):
    """Distances+angle -> gravity-center 7-DoF box (``imvoxel_head.py:432-449``)."""
    shift = jnp.stack([
        (bbox_pred[:, 1] - bbox_pred[:, 0]) / 2,
        (bbox_pred[:, 3] - bbox_pred[:, 2]) / 2,
        (bbox_pred[:, 5] - bbox_pred[:, 4]) / 2,
    ], axis=-1)[:, None, :]
    shift = box_ops.rotation_3d_in_axis(shift, bbox_pred[:, 6], axis=2)[:, 0, :]
    center = points + shift
    size = jnp.stack([
        bbox_pred[:, 0] + bbox_pred[:, 1],
        bbox_pred[:, 2] + bbox_pred[:, 3],
        bbox_pred[:, 4] + bbox_pred[:, 5],
    ], axis=-1)
    return jnp.concatenate([center, size, bbox_pred[:, 6:7]], axis=-1)


def scannet_bbox_pred_to_bbox(points, bbox_pred):
    """Distances -> corner-form box (x1y1z1x2y2z2) (``imvoxel_head.py:552-560``)."""
    return jnp.stack([
        points[:, 0] - bbox_pred[:, 0],
        points[:, 1] - bbox_pred[:, 2],
        points[:, 2] - bbox_pred[:, 4],
        points[:, 0] + bbox_pred[:, 1],
        points[:, 1] + bbox_pred[:, 3],
        points[:, 2] + bbox_pred[:, 5],
    ], axis=-1)


def mlvl_points(featmap_sizes, voxel_size, origin):
    """Per-level voxel centers, level i at ``voxel_size * 2**i``
    (``imvoxel_head.py:226-235``)."""
    pts = []
    for i, size in enumerate(featmap_sizes):
        vs = tuple(v * (2 ** i) for v in voxel_size)
        pts.append(get_points(size, vs, origin).reshape(-1, 3))
    return pts


# ---------------------------------------------------------------------------
# Target assignment (dense, padded-GT, per-sample — vmap over batch)
# ---------------------------------------------------------------------------

def indoor_targets(points, scales, regress_ranges, gt_boxes, gt_labels,
                   gt_mask, cfg: IndoorHeadConfig):
    """FCOS-style 3D target assignment, v1 and v2 unified.

    Args:
      points: ``(P, 3)`` all-level voxel centers (concatenated).
      scales: ``(P,)`` int level index of each point.
      regress_ranges: ``(P, 2)`` per-point regress range (v1 only).
      gt_boxes: ``(G, 7)`` bottom-center padded GT.
      gt_labels: ``(G,)`` int.
      gt_mask: ``(G,)`` bool.

    Returns:
      centerness_t ``(P,)``, bbox_t (``(P, 7)`` gravity-center box for
      sunrgbd / ``(P, 6)`` corner box for scannet), labels ``(P,)`` with ``-1``
      as background.
    """
    n_points = points.shape[0]
    n_boxes = gt_boxes.shape[0]
    centers = box_ops.gravity_center(gt_boxes)          # (G, 3)
    vols = box_ops.volume(gt_boxes)                     # (G,)

    offset = points[:, None, :] - centers[None, :, :]   # (P, G, 3)
    if cfg.with_yaw:
        # rotate into the box frame (reference rotates by -yaw, axis z)
        offset_t = jnp.swapaxes(offset, 0, 1)           # (G, P, 3)
        offset_t = box_ops.rotation_3d_in_axis(
            offset_t, -gt_boxes[:, 6], axis=2)
        offset = jnp.swapaxes(offset_t, 0, 1)
    half = gt_boxes[None, :, 3:6] / 2.0                 # (1, G, 3)
    d_min = offset + half                                # dist to min faces
    d_max = half - offset                                # dist to max faces
    bbox_targets = jnp.stack([
        d_min[..., 0], d_max[..., 0],
        d_min[..., 1], d_max[..., 1],
        d_min[..., 2], d_max[..., 2],
    ], axis=-1)                                          # (P, G, 6)
    if cfg.with_yaw:
        bbox_targets = jnp.concatenate(
            [bbox_targets,
             jnp.broadcast_to(gt_boxes[None, :, 6:7], (n_points, n_boxes, 1))],
            axis=-1)

    inside = bbox_targets[..., :6].min(-1) > 0           # (P, G)
    inside = inside & gt_mask[None, :]

    volumes = jnp.broadcast_to(vols[None, :], (n_points, n_boxes))
    volumes = jnp.where(inside, volumes, INF)

    if cfg.version == 1:
        max_dist = bbox_targets[..., :6].max(-1)
        in_range = ((max_dist >= regress_ranges[:, None, 0])
                    & (max_dist <= regress_ranges[:, None, 1]))
        volumes = jnp.where(in_range, volumes, INF)
        cond_mask = inside & in_range
        kth = cfg.centerness_topk            # v1: k-th value, strict greater
    else:
        # v2 condition2: coarsest scale with >= limit positive points per box
        n_pos_per_scale = jnp.stack([
            jnp.sum(inside & (scales[:, None] == i), axis=0)
            for i in range(cfg.n_scales)
        ])                                               # (S, G)
        under = n_pos_per_scale < cfg.limit              # (S, G)
        any_under = jnp.any(under, axis=0)
        first_under = jnp.argmax(under, axis=0)          # first True (or 0)
        best = jnp.where(any_under,
                         jnp.maximum(first_under - 1, 0),
                         cfg.n_scales - 1)               # (G,)
        in_best = scales[:, None] == best[None, :]
        volumes = jnp.where(in_best, volumes, INF)
        cond_mask = inside & in_best
        kth = cfg.centerness_topk + 1        # v2: (k+1)-th value, strict greater

    if cfg.centerness_topk > 0:
        cness = compute_centerness(bbox_targets)         # (P, G)
        cness = jnp.where(cond_mask, cness, -1.0)
        k = min(kth, n_points)
        top = jax.lax.top_k(cness.T, k)[0][:, -1]        # (G,)
        in_top = cness > top[None, :]
        volumes = jnp.where(in_top, volumes, INF)

    min_vol = volumes.min(axis=1)
    min_inds = jnp.argmin(volumes, axis=1)               # (P,)
    labels = jnp.where(min_vol < INF, gt_labels[min_inds], -1)

    assigned = jnp.take_along_axis(
        bbox_targets, min_inds[:, None, None], axis=1)[:, 0]  # (P, 6/7)
    centerness_t = compute_centerness(assigned)

    if cfg.dataset == 'sunrgbd':
        gc_boxes = jnp.concatenate([centers, gt_boxes[:, 3:]], axis=-1)
        bbox_t = gc_boxes[min_inds]                      # (P, 7)
    else:
        bbox_t = scannet_bbox_pred_to_bbox(points, assigned)  # (P, 6)
    return centerness_t, bbox_t, labels


# ---------------------------------------------------------------------------
# Loss (per-sample, batch mean outside)
# ---------------------------------------------------------------------------

def resize_valid_to_levels(valid, featmap_sizes):
    """Trilinear-resize the (B, nx, ny, nz) validity mask to each level and
    round — parity with ``nn.Upsample(mode='trilinear')(valid).round().bool()``
    (``imvoxel_head.py:112-114``).

    ``antialias=False`` is load-bearing: levels 1..S-1 are *down*-scales of the
    level-0 mask, where jax's default antialiased triangle kernel widens the
    footprint and diverges from torch's plain trilinear sampling (measured 18%
    of level-1 voxels flipped on a random mask).  Without antialiasing both
    libraries sample the same 8-neighbour lerp at half-pixel-centre positions
    (align_corners=False), and ``round`` is round-half-to-even in both.
    Pinned against live torch in ``tests/test_valid_resize.py``.
    """
    out = []
    b = valid.shape[0]
    vf = valid.astype(jnp.float32)
    for size in featmap_sizes:
        r = jax.image.resize(vf, (b,) + tuple(size), method='linear',
                             antialias=False)
        out.append(jnp.round(r) > 0)
    return out


def _flatten_levels(levels):
    """[(B, nx, ny, nz, C)] -> (B, P, C) concatenated in level order."""
    flat = [lv.reshape(lv.shape[0], -1, lv.shape[-1]) for lv in levels]
    return jnp.concatenate(flat, axis=1)


def indoor_head_loss(head_outs, valid, origins, gt_boxes, gt_labels, gt_mask,
                     cfg: IndoorHeadConfig, axis_name: Optional[str] = None,
                     batch_mean: bool = False):
    """Batch loss.  Parity: ``ImVoxelHead.loss/_loss_single``
    (``imvoxel_head.py:86-224``) with ``reduce_mean`` -> ``lax.pmean``.

    ``batch_mean=True`` normalizes every image by the global-batch mean
    positive count — the production GSPMD analog of the reference's
    cross-rank ``reduce_mean`` (see ``ImVoxelNetConfig.dp_loss_norm``).

    Args:
      head_outs: (centernesses, bbox_preds, cls_scores) level lists,
        channel-last ``(B, nx, ny, nz, C)``.
      valid: ``(B, nx, ny, nz)`` bool seen-by-any-view mask (level-0 res).
      origins: ``(B, 3)`` voxel grid origins.
      gt_boxes: ``(B, G, 7)`` padded bottom-center boxes.
      gt_labels: ``(B, G)``; gt_mask: ``(B, G)`` bool.
    """
    centernesses, bbox_preds, cls_scores = head_outs
    featmap_sizes = [tuple(x.shape[1:4]) for x in centernesses]
    valids = resize_valid_to_levels(valid, featmap_sizes)

    flat_center = _flatten_levels(centernesses)[..., 0]      # (B, P)
    flat_bbox = _flatten_levels(bbox_preds)                  # (B, P, R)
    flat_cls = _flatten_levels(cls_scores)                   # (B, P, C)
    flat_valid = jnp.concatenate(
        [v.reshape(v.shape[0], -1) for v in valids], axis=1)  # (B, P)

    # static per-level metadata
    level_sizes = [s[0] * s[1] * s[2] for s in featmap_sizes]
    scales = jnp.concatenate([
        jnp.full((n,), i, jnp.int32) for i, n in enumerate(level_sizes)])
    rr = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(cfg.regress_ranges[i], jnp.float32),
                         (n, 2)) for i, n in enumerate(level_sizes)])

    def per_sample(center, bbox, cls, valid_b, origin, boxes, labels, mask):
        pts = jnp.concatenate(
            mlvl_points(featmap_sizes, cfg.voxel_size, origin), axis=0)
        centerness_t, bbox_t, labels_t = indoor_targets(
            pts, scales, rr, boxes, labels, mask, cfg)
        pos = (labels_t >= 0) & valid_b
        if cfg.dataset == 'sunrgbd':
            pred_box = sunrgbd_bbox_pred_to_bbox(pts, bbox)
        else:
            pred_box = scannet_bbox_pred_to_bbox(pts, bbox)
        return centerness_t, bbox_t, labels_t, pos, pred_box

    centerness_t, bbox_t, labels_t, pos, pred_boxes = jax.vmap(per_sample)(
        flat_center, flat_bbox, flat_cls, flat_valid, origins,
        gt_boxes, gt_labels, gt_mask)

    # Per-image positive count: the reference's ``_loss_single`` computes
    # ``n_pos = max(reduce_mean(len(pos_inds)), 1)`` *per image*
    # (``imvoxel_head.py:196-197``) — ``reduce_mean`` averages across DDP
    # ranks at the same within-batch slot and is the identity at world=1.
    # ``axis_name`` (shard_map DP) reproduces the cross-rank mean exactly.
    n_pos = jnp.sum(pos, axis=1).astype(jnp.float32)         # (B,)
    if batch_mean:
        # production GSPMD multi-chip: one normalizer for the whole global
        # batch (the reference's cross-rank mean with the group widened to
        # the global batch; exact at samples_per_gpu=1)
        n_pos = jnp.broadcast_to(jnp.mean(n_pos), n_pos.shape)
    if axis_name is not None:
        n_pos = jax.lax.pmean(n_pos, axis_name)
    n_pos_avg = jnp.maximum(n_pos, 1.0)                      # (B,)

    def sample_losses(cls, labels_s, valid_b, center, centerness_ts, pos_s,
                      pred_box, bbox_ts, n_pos_s):
        cls_labels = jnp.where(labels_s >= 0, labels_s, cfg.n_classes)
        loss_cls = loss_ops.sigmoid_focal_loss(
            cls, cls_labels, weight=valid_b.astype(jnp.float32),
            avg_factor=n_pos_s)
        posf = pos_s.astype(jnp.float32)
        loss_center = loss_ops.binary_cross_entropy(
            center, centerness_ts, weight=posf, avg_factor=n_pos_s)
        w = centerness_ts * posf
        if cfg.dataset == 'sunrgbd':
            gc_pred = pred_box
            gc_t = bbox_ts
            loss_bbox = loss_ops.iou_3d_loss(
                gc_pred, gc_t, weight=w, avg_factor=jnp.sum(w))
        else:
            loss_bbox = loss_ops.axis_aligned_iou_loss(
                pred_box, bbox_ts, weight=w, avg_factor=jnp.sum(w))
        return loss_center, loss_bbox, loss_cls

    lc, lb, lcls = jax.vmap(sample_losses)(
        flat_cls, labels_t, flat_valid, flat_center, centerness_t, pos,
        pred_boxes, bbox_t, n_pos_avg)
    return dict(
        loss_centerness=jnp.mean(lc),
        loss_bbox=jnp.mean(lb),
        loss_cls=jnp.mean(lcls),
    )


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------

def indoor_head_get_bboxes(head_outs, valid, origins, cfg: IndoorHeadConfig):
    """Fixed-shape inference.  Parity: ``_get_bboxes_single`` + ``_nms``
    (``imvoxel_head.py:269-306, 410-430, 533-550``).

    Returns dict of per-sample fixed-size arrays:
      ``boxes (B, max_out, 7)`` bottom-center (yaw 0 for scannet),
      ``scores``, ``labels``, ``valid`` (each ``(B, max_out)``).
    """
    centernesses, bbox_preds, cls_scores = head_outs
    featmap_sizes = [tuple(x.shape[1:4]) for x in centernesses]
    valids = resize_valid_to_levels(valid, featmap_sizes)

    def per_sample(args):
        centers, bboxes, clss, valids_b, origin = args
        pts_lvl = mlvl_points(featmap_sizes, cfg.voxel_size, origin)
        cand_boxes, cand_scores = [], []
        for centerness, bbox_pred, cls_score, valid_l, pts in zip(
                centers, bboxes, clss, valids_b, pts_lvl):
            c = jax.nn.sigmoid(centerness.reshape(-1))
            bp = bbox_pred.reshape(-1, bbox_pred.shape[-1])
            s = jax.nn.sigmoid(cls_score.reshape(-1, cfg.n_classes))
            v = valid_l.reshape(-1)
            s = s * c[:, None] * v[:, None].astype(s.dtype)
            max_s = s.max(axis=1)
            k = min(cfg.nms_pre, max_s.shape[0])
            _, ids = jax.lax.top_k(max_s, k)
            bp, s, p = bp[ids], s[ids], pts[ids]
            if cfg.dataset == 'sunrgbd':
                cand_boxes.append(sunrgbd_bbox_pred_to_bbox(p, bp))
            else:
                cand_boxes.append(scannet_bbox_pred_to_bbox(p, bp))
            cand_scores.append(s)
        boxes = jnp.concatenate(cand_boxes)                  # (N, 7|6)
        scores = jnp.concatenate(cand_scores)                # (N, C)

        if cfg.dataset == 'sunrgbd':
            # rotated multi-class NMS on (x, y, dx, dy) + yaw corners
            bev = jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3],
                             boxes[:, 4], boxes[:, 6]], axis=-1)
            if cfg.pre_nms_k <= 0:
                out = nms_ops.multiclass_nms_3d_exact(
                    boxes, bev, scores, jnp.ones(boxes.shape[0], bool),
                    score_thr=cfg.score_thr, max_num=cfg.max_out,
                    iou_thr=cfg.iou_thr)
            else:
                out = nms_ops.multiclass_nms_3d(
                    boxes, bev, scores, jnp.ones(boxes.shape[0], bool),
                    score_thr=cfg.score_thr, max_num=cfg.max_out,
                    iou_thr=cfg.iou_thr, pre_nms_k=cfg.pre_nms_k)
            out_boxes = box_ops.to_bottom_center(out['boxes'])
            return out_boxes, out['scores'], out['labels'], out['valid']
        else:
            s, lab = scores.max(axis=1), jnp.argmax(scores, axis=1)
            cand_valid = s > cfg.score_thr
            keep = nms_ops.aligned_3d_nms(boxes, s, lab, cand_valid,
                                          cfg.iou_thr)
            masked = jnp.where(keep, s, -1.0)
            top_s, idx = jax.lax.top_k(masked, cfg.max_out)
            corner = boxes[idx]
            center_size = jnp.stack([
                (corner[:, 0] + corner[:, 3]) / 2,
                (corner[:, 1] + corner[:, 4]) / 2,
                corner[:, 2],                           # bottom z
                corner[:, 3] - corner[:, 0],
                corner[:, 4] - corner[:, 1],
                corner[:, 5] - corner[:, 2],
                jnp.zeros_like(corner[:, 0]),
            ], axis=-1)
            return (center_size, jnp.maximum(top_s, 0.0), lab[idx],
                    top_s > 0)

    boxes, scores, labels, valid_out = jax.vmap(per_sample)(
        ([c for c in centernesses], [b for b in bbox_preds],
         [c for c in cls_scores], valids, origins))
    return dict(boxes=boxes, scores=scores, labels=labels, valid=valid_out)
