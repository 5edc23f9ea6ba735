"""BEV anchor-based outdoor head (KITTI / nuScenes).

Parity: ``Anchor3DHead`` (``mmdet3d/models/dense_heads/anchor3d_head.py``)
with the ImVoxelNet adaptations: single BEV level, MaxIoU (nearest-BEV)
assignment, sin-difference yaw encoding (:279-301), focal/smooth-L1/dir-CE
losses (:194-277), rotated multiclass NMS + direction-bin yaw reconstruction
(:428-517).  Targets are dense/padded and vmapped (see
``core/target_assign.py``); inference is fixed-shape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import anchors as anchor_gen
from ...core import coder
from ...core import target_assign
from ...ops import boxes as box_ops
from ...ops import losses as loss_ops
from ...ops import nms as nms_ops


@dataclasses.dataclass(frozen=True)
class Anchor3DHeadConfig:
    num_classes: int = 1
    feat_channels: int = 256
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (0, -39.68, -1.78, 69.12 - .32, 39.68 - .32, -1.78),)
    anchor_sizes: Tuple[Tuple[float, float, float], ...] = ((1.6, 3.9, 1.56),)
    anchor_rotations: Tuple[float, ...] = (0.0, 1.57)
    anchor_custom_values: Tuple[float, ...] = ()
    use_direction_classifier: bool = True
    diff_rad_by_sin: bool = True
    dir_offset: float = 0.0
    dir_limit_offset: float = 1.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_dir_weight: float = 0.2
    assigner: target_assign.AssignerConfig = target_assign.AssignerConfig()
    # test cfg (imvoxelnet_kitti.py:58-65)
    nms_pre: int = 100
    score_thr: float = 0.1
    iou_thr: float = 0.01          # nms_thr
    max_out: int = 50              # max_num
    use_rotate_nms: bool = True

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_rotations)

    @property
    def box_code_size(self) -> int:
        return 7 + len(self.anchor_custom_values)


def _cls_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, -4.59511985013459, dtype)


class Anchor3DHead(nn.Module):
    """1x1 conv heads on the BEV map (``anchor3d_head.py:122-130``);
    outputs cast to float32 for the loss/decode path."""

    cfg: Anchor3DHeadConfig
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = x.astype(self.dtype)
        init = nn.initializers.normal(0.01)
        cls_score = nn.Conv(cfg.num_anchors * cfg.num_classes, (1, 1),
                            kernel_init=init, bias_init=_cls_bias_init,
                            dtype=self.dtype,
                            name='conv_cls')(x).astype(jnp.float32)
        bbox_pred = nn.Conv(cfg.num_anchors * cfg.box_code_size, (1, 1),
                            kernel_init=init, dtype=self.dtype,
                            name='conv_reg')(x).astype(jnp.float32)
        dir_pred = None
        if cfg.use_direction_classifier:
            dir_pred = nn.Conv(cfg.num_anchors * 2, (1, 1), dtype=self.dtype,
                               name='conv_dir_cls')(x).astype(jnp.float32)
        return cls_score, bbox_pred, dir_pred


def head_anchors(featmap_size, cfg: Anchor3DHeadConfig):
    """Flattened anchors matching the conv-head channel layout."""
    return anchor_gen.grid_anchors(
        featmap_size, cfg.anchor_ranges, cfg.anchor_sizes,
        cfg.anchor_rotations, cfg.anchor_custom_values)


def _flatten_pred(x, last):
    """(B, H, W, A*K) -> (B, H*W*A, K), anchor-major like the reference."""
    b, h, w, _ = x.shape
    return x.reshape(b, -1, last)


def add_sin_difference(pred_yaw, target_yaw):
    """sin(a - b) factorisation (``anchor3d_head.py:279-301``)."""
    return (jnp.sin(pred_yaw) * jnp.cos(target_yaw),
            jnp.cos(pred_yaw) * jnp.sin(target_yaw))


def anchor3d_head_loss(head_outs, gt_boxes, gt_labels, gt_mask,
                       cfg: Anchor3DHeadConfig,
                       axis_name: Optional[str] = None):
    """Batch loss.  Parity: ``Anchor3DHead.loss/loss_single``
    (``anchor3d_head.py:194-373``); ``num_total_samples`` is the batch's
    positive count ``sum_i max(n_pos_i, 1)`` (``train_mixins.py:80-84``).

    DP normalization semantics (documented divergence): under GSPMD this
    function sees the GLOBAL batch, so losses normalize by the global
    positive count; the reference's DDP normalizes per rank and then
    averages the rank losses.  The two weightings differ whenever ranks
    carry unequal ``n_pos`` (global weighting is the less noisy estimator —
    every positive contributes equally regardless of which rank drew it).
    At world size 1, and in ``tests/test_loss_parity.py``'s single-process
    setting, they coincide exactly."""
    cls_score, bbox_pred, dir_pred = head_outs
    b, h, w, _ = cls_score.shape
    anchors = head_anchors((h, w), cfg)                    # (N, 7)

    targets = jax.vmap(
        lambda boxes, labels, mask: target_assign.anchor_targets_single(
            anchors, boxes, labels, mask, cfg.assigner, cfg.num_classes,
            cfg.dir_offset)
    )(gt_boxes, gt_labels, gt_mask)

    num_total = jnp.sum(targets['n_pos']).astype(jnp.float32)

    cls_flat = _flatten_pred(cls_score, cfg.num_classes)   # (B, N, C)
    box_flat = _flatten_pred(bbox_pred, cfg.box_code_size)
    labels = targets['labels']                              # (B, N)
    lw = targets['label_weights']
    bt = targets['bbox_targets']
    bw = targets['bbox_weights']

    loss_cls = loss_ops.sigmoid_focal_loss(
        cls_flat.reshape(-1, cfg.num_classes), labels.reshape(-1),
        weight=lw.reshape(-1), avg_factor=num_total,
        loss_weight=cfg.loss_cls_weight)

    pred = box_flat
    tgt = bt
    if cfg.diff_rad_by_sin:
        sp, st = add_sin_difference(pred[..., 6], tgt[..., 6])
        pred = jnp.concatenate(
            [pred[..., :6], sp[..., None], pred[..., 7:]], axis=-1)
        tgt = jnp.concatenate(
            [tgt[..., :6], st[..., None], tgt[..., 7:]], axis=-1)
    loss_bbox = loss_ops.smooth_l1_loss(
        pred, tgt, weight=bw[..., None], beta=1.0 / 9.0,
        avg_factor=num_total, loss_weight=cfg.loss_bbox_weight)

    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
    if cfg.use_direction_classifier:
        dir_flat = _flatten_pred(dir_pred, 2)
        loss_dir = loss_ops.softmax_cross_entropy(
            dir_flat.reshape(-1, 2), targets['dir_targets'].reshape(-1),
            weight=targets['dir_weights'].reshape(-1), avg_factor=num_total,
            loss_weight=cfg.loss_dir_weight)
        losses['loss_dir'] = loss_dir
    return losses


def anchor3d_head_get_bboxes(head_outs, cfg: Anchor3DHeadConfig):
    """Fixed-shape inference.  Parity: ``get_bboxes_single``
    (``anchor3d_head.py:428-517``) incl. the dir-bin yaw reconstruction."""
    cls_score, bbox_pred, dir_pred = head_outs
    b, h, w, _ = cls_score.shape
    anchors = head_anchors((h, w), cfg)

    def per_sample(cls_s, box_p, dir_p):
        scores = jax.nn.sigmoid(cls_s.reshape(-1, cfg.num_classes))
        deltas = box_p.reshape(-1, cfg.box_code_size)
        dir_score = jnp.argmax(dir_p.reshape(-1, 2), axis=-1)

        max_scores = scores.max(axis=1)
        k = min(cfg.nms_pre, max_scores.shape[0])
        _, ids = jax.lax.top_k(max_scores, k)
        a, d, s, ds = anchors[ids], deltas[ids], scores[ids], dir_score[ids]
        boxes = coder.decode(a, d)
        bev_xywhr = box_ops.bev(boxes)
        out = nms_ops.multiclass_nms_3d(
            boxes, bev_xywhr, s, jnp.ones(k, bool),
            score_thr=cfg.score_thr, max_num=cfg.max_out,
            iou_thr=cfg.iou_thr, use_rotate_nms=cfg.use_rotate_nms,
            pre_nms_k=k, mlvl_dir_scores=ds.astype(s.dtype))
        boxes_out = out['boxes']
        dir_rot = box_ops.limit_period(
            boxes_out[:, 6] - cfg.dir_offset, cfg.dir_limit_offset, math.pi)
        yaw = dir_rot + cfg.dir_offset + math.pi * out['dir_scores']
        boxes_out = boxes_out.at[:, 6].set(
            jnp.where(out['valid'], yaw, boxes_out[:, 6]))
        return boxes_out, out['scores'], out['labels'], out['valid']

    boxes, scores, labels, valid = jax.vmap(per_sample)(
        cls_score, bbox_pred, dir_pred)
    return dict(boxes=boxes, scores=scores, labels=labels, valid=valid)
