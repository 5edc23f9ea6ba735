"""Loss functions used across the ImVoxelNet heads, as pure jnp.

All losses are *masked* rather than index-gathered: callers pass dense
per-element weights and an ``avg_factor`` so shapes stay static under ``jit``.
Replaces the mmcv/mmdet CUDA focal-loss kernel and the python loss registry:
  - FocalLoss (sigmoid, gamma=2, alpha=.25)   — mmdet, used via config
    (``configs/imvoxelnet/imvoxelnet_kitti.py:36-41``).
  - SmoothL1Loss (beta=1/9, weight 2.0)        — KITTI box regression.
  - CrossEntropy (softmax, weight .2)          — direction classifier.
  - Binary CE (sigmoid)                        — centerness.
  - AxisAlignedIoULoss                         — ScanNet heads
    (``mmdet3d/models/losses/axis_aligned_iou_loss.py:28``).
  - IoU3DLoss / GIoU3DLoss                     — SUN RGB-D heads
    (``mmdet3d/ops/rotated_iou/iou3d_loss.py:62-71``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import iou as iou_ops


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def sigmoid_focal_loss(logits, labels, weight=None, *, gamma: float = 2.0,
                       alpha: float = 0.25, avg_factor=1.0,
                       loss_weight: float = 1.0):
    """Sigmoid focal loss.

    Args:
      logits: ``(N, C)`` raw scores.
      labels: ``(N,)`` int labels in ``[0, C]``; ``C`` means background
        (matching mmdet's convention where background has no positive column).
      weight: optional ``(N,)`` per-element weights.
    """
    n, num_classes = logits.shape
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = jnp.logaddexp(0.0, logits) - logits * one_hot  # BCE with logits
    p_t = p * one_hot + (1 - p) * (1 - one_hot)
    alpha_t = alpha * one_hot + (1 - alpha) * (1 - one_hot)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    loss = jnp.sum(loss, axis=-1)
    return loss_weight * _reduce(loss, weight, avg_factor)


def smooth_l1_loss(pred, target, weight=None, *, beta: float = 1.0,
                   avg_factor=1.0, loss_weight: float = 1.0):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss_weight * _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(logits, labels, weight=None, *, avg_factor=1.0,
                          loss_weight: float = 1.0):
    log_p = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
    return loss_weight * _reduce(nll, weight, avg_factor)


def binary_cross_entropy(logits, targets, weight=None, *, avg_factor=1.0,
                         loss_weight: float = 1.0):
    loss = jnp.logaddexp(0.0, logits) - logits * targets
    return loss_weight * _reduce(loss, weight, avg_factor)


def axis_aligned_iou_loss(pred_corner, target_corner, weight=None, *,
                          avg_factor=1.0, loss_weight: float = 1.0):
    """``1 - IoU`` on ``(N, 6)`` corner-form axis-aligned boxes.

    Parity: ``axis_aligned_iou_loss`` (``losses/axis_aligned_iou_loss.py:9-25``).
    """
    ious = iou_ops.axis_aligned_bbox_overlaps_3d(
        pred_corner, target_corner, is_aligned=True)
    return loss_weight * _reduce(1.0 - ious, weight, avg_factor)


def _smallest_enclosing_area(corners):
    """Min-area enclosing rectangle of ``(..., 8, 2)`` corner sets.

    Parity: ``smallest_bounding_box``
    (``mmdet3d/ops/rotated_iou/min_enclosing_box.py:142-172``): every corner
    pair is a candidate edge direction; width = projection extent along the
    direction, height = extent along the perpendicular; take the min area.
    Differentiable (min over smooth candidates).
    """
    n = corners.shape[-2]
    ii, jj = jnp.triu_indices(n, k=1)
    d = corners[..., jj, :] - corners[..., ii, :]           # (..., P, 2)
    length = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(length, 1e-8)
    u = d / safe[..., None]                                  # unit directions
    v = jnp.stack([-u[..., 1], u[..., 0]], axis=-1)          # perpendicular
    proj_u = jnp.einsum('...kd,...pd->...pk', corners, u)    # (..., P, 8)
    proj_v = jnp.einsum('...kd,...pd->...pk', corners, v)
    w = proj_u.max(-1) - proj_u.min(-1)                      # (..., P)
    h = proj_v.max(-1) - proj_v.min(-1)
    area = w * h
    area = jnp.where(length > 1e-6, area, 1e8)
    return area.min(-1)


def giou_3d_loss(pred_gc, target_gc, weight=None, *, avg_factor=1.0,
                 loss_weight: float = 1.0):
    """Rotated 3D GIoU loss on gravity-center 7-DoF boxes.

    Parity: ``GIoU3DLoss`` (``mmdet3d/ops/rotated_iou/iou3d_loss.py:36-59`` /
    ``cal_giou_3d`` ``oriented_iou_loss.py:112-130``) with the default
    'smallest' enclosing box.  Registered but unused by the shipped configs
    (the shipped heads use ``IoU3DLoss``).
    """
    from . import boxes as box_ops

    ious = iou_ops.iou_3d_aligned(pred_gc, target_gc)
    vol1 = pred_gc[..., 3] * pred_gc[..., 4] * pred_gc[..., 5]
    vol2 = target_gc[..., 3] * target_gc[..., 4] * target_gc[..., 5]
    # recover the union from iou: inter = iou * union, union = v1 + v2 - inter
    inter = ious * (vol1 + vol2) / (1.0 + ious)
    union = vol1 + vol2 - inter

    def bev(b):
        return jnp.concatenate([b[..., 0:2], b[..., 3:5], b[..., 6:7]], -1)

    # the rotated-iou extension's yaw convention (box2corners_th), matching
    # cal_giou_3d's corner source — see ops/boxes.py:bev_corners_loss
    c1 = box_ops.bev_corners_loss(bev(pred_gc))
    c2 = box_ops.bev_corners_loss(bev(target_gc))
    area_c = _smallest_enclosing_area(jnp.concatenate([c1, c2], axis=-2))
    z_max = jnp.maximum(pred_gc[..., 2] + pred_gc[..., 5] / 2,
                        target_gc[..., 2] + target_gc[..., 5] / 2)
    z_min = jnp.minimum(pred_gc[..., 2] - pred_gc[..., 5] / 2,
                        target_gc[..., 2] - target_gc[..., 5] / 2)
    v_c = jnp.maximum(area_c * (z_max - z_min), 1e-8)
    giou_loss = 1.0 - ious + (v_c - union) / v_c
    return loss_weight * _reduce(giou_loss, weight, avg_factor)


def iou_3d_loss(pred_gc, target_gc, weight=None, *, avg_factor=1.0,
                loss_weight: float = 1.0):
    """Differentiable rotated 3D IoU loss on gravity-center 7-DoF boxes.

    Parity: ``IoU3DLoss`` (``mmdet3d/ops/rotated_iou/iou3d_loss.py:10-33``):
    ``1 - cal_iou_3d(pred, target)``; the exact rotated intersection is
    computed in pure XLA (see ``ops/iou.py:iou_3d_aligned``), so gradients
    flow without the external CUDA ``sort_v`` extension.
    """
    ious = iou_ops.iou_3d_aligned(pred_gc, target_gc)
    return loss_weight * _reduce(1.0 - ious, weight, avg_factor)
