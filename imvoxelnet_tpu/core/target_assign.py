"""Dense MaxIoU anchor-target assignment (per-sample, padded GT).

Parity: mmdet ``MaxIoUAssigner`` (with ``BboxOverlapsNearest3D``) +
``PseudoSampler`` + ``AnchorTrainMixin.anchor_target_single_assigner``
(``mmdet3d/models/dense_heads/train_mixins.py:237-346``), re-expressed as one
dense computation over an ``(n_anchors, max_gt)`` IoU matrix so it vmaps over
the batch and compiles once.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import iou as iou_ops
from . import coder


@dataclasses.dataclass(frozen=True)
class AssignerConfig:
    pos_iou_thr: float = 0.6
    neg_iou_thr: float = 0.45
    min_pos_iou: float = 0.45


def max_iou_assign(anchors, gt_boxes, gt_mask, cfg: AssignerConfig):
    """Assign each anchor to a GT (or background / ignore).

    Returns:
      assigned: ``(N,)`` int — index of the assigned GT, ``-1`` background,
        ``-2`` ignore (the reference's ``0`` / ``-1`` shifted to 0-based GT
        indices).
    """
    ious = iou_ops.bbox_overlaps_nearest_3d(anchors, gt_boxes)   # (N, G)
    ious = jnp.where(gt_mask[None, :], ious, -1.0)

    max_iou = ious.max(axis=1)
    argmax = jnp.argmax(ious, axis=1)

    assigned = jnp.full(anchors.shape[0], -2, jnp.int32)        # ignore
    assigned = jnp.where(max_iou < cfg.neg_iou_thr, -1, assigned)
    assigned = jnp.where(max_iou >= cfg.pos_iou_thr,
                         argmax.astype(jnp.int32), assigned)

    # low-quality matches: each GT claims its best-overlap anchors
    # (gt_max_assign_all=True); later GTs overwrite earlier ones, so take the
    # highest claiming GT index per anchor.
    gt_max = ious.max(axis=0)                                    # (G,)
    claim = (ious == gt_max[None, :]) & (gt_max[None, :] >= cfg.min_pos_iou)
    claim = claim & gt_mask[None, :] & (gt_max[None, :] > 0)
    g = gt_boxes.shape[0]
    rev_idx = jnp.arange(g - 1, -1, -1)
    has_claim = jnp.any(claim, axis=1)
    last_claim = g - 1 - jnp.argmax(claim[:, ::-1], axis=1)
    assigned = jnp.where(has_claim, last_claim.astype(jnp.int32), assigned)
    del rev_idx
    return assigned


def get_direction_target(anchors_yaw, gt_yaw, dir_offset: float = 0.0,
                         num_bins: int = 2):
    """Yaw -> direction bin (``train_mixins.py:317-346``, one_hot=False)."""
    rot = box_ops.limit_period(gt_yaw - dir_offset, 0.0, 2 * math.pi)
    bins = jnp.floor(rot / (2 * math.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(bins, 0, num_bins - 1)


def anchor_targets_single(anchors, gt_boxes, gt_labels, gt_mask,
                          assigner: AssignerConfig, num_classes: int,
                          dir_offset: float = 0.0):
    """Per-sample anchor targets (vmap over batch).

    Returns dict: labels ``(N,)`` (bg = num_classes), label_weights,
    bbox_targets ``(N, 7)``, bbox_weights ``(N,)``, dir_targets ``(N,)``,
    dir_weights ``(N,)``, n_pos scalar.
    """
    n = anchors.shape[0]
    assigned = max_iou_assign(anchors, gt_boxes, gt_mask, assigner)
    pos = assigned >= 0
    neg = assigned == -1
    gt_idx = jnp.clip(assigned, 0)

    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)
    label_weights = (pos | neg).astype(jnp.float32)

    matched = gt_boxes[gt_idx]
    bbox_targets = coder.encode(anchors, matched)
    bbox_targets = jnp.where(pos[:, None], bbox_targets, 0.0)
    bbox_weights = pos.astype(jnp.float32)

    dir_targets = get_direction_target(anchors[:, 6], matched[:, 6],
                                       dir_offset)
    dir_targets = jnp.where(pos, dir_targets, 0)
    dir_weights = pos.astype(jnp.float32)

    n_pos = jnp.maximum(jnp.sum(pos), 1)
    return dict(labels=labels, label_weights=label_weights,
                bbox_targets=bbox_targets, bbox_weights=bbox_weights,
                dir_targets=dir_targets, dir_weights=dir_weights, n_pos=n_pos)
