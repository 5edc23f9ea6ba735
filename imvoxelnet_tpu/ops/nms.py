"""Fixed-shape 3D NMS for TPU.

TPU-native replacement for the reference's CUDA bitmask NMS
(``mmdet3d/ops/iou3d/src/iou3d_kernel.cu:284-439`` + python drivers
``mmdet3d/core/post_processing/box3d_nms.py:8-138``).  Everything here is
static-shape: candidate sets are top-k padded, suppression is a greedy
``fori_loop`` over the sorted score order, and results come back as fixed-size
arrays plus validity masks, so the whole post-processing graph compiles once
under ``jit``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import iou as iou_ops

_NEG = -1e10


def greedy_nms_from_iou_batched(iou_matrix, scores, valid, iou_thr: float,
                                *, presorted: bool = False):
    """Greedy NMS given precomputed pairwise IoU matrices — exact, parallel.

    Instead of the N-step sequential loop (the CUDA kernel's structure), this
    iterates the fixpoint ``keep[j] = valid[j] & no kept higher-ranked i
    dominates j`` — whose unique fixpoint *is* the greedy solution — with a
    ``while_loop`` that converges in the depth of the longest suppression
    chain (typically 2-4 matrix steps instead of N scalar steps).  Leading
    batch dims (a class axis) share ONE while loop: the loop runs until every
    batch member converges, which costs far less than one loop per class
    (round-4 SUN RGB-D `_fast` trace: the per-class ``lax.map`` spent
    11.8 ms/step in loop control alone).

    Args:
      iou_matrix: ``(..., N, N)`` pairwise IoU.
      scores: ``(..., N)``; suppression follows descending score order.
      valid: ``(..., N)`` bool, entries to consider at all.
      iou_thr: suppression threshold (strictly-greater comparison, matching
        the CUDA kernel's ``iou > nms_thresh``).
      presorted: if True, rows are already in descending-score order (e.g.
        straight out of ``top_k``) — skips the argsort and the two matrix
        gathers, and returns the mask in the given order.

    Returns:
      keep: ``(..., N)`` bool mask over the *input* order.
    """
    n = scores.shape[-1]
    if presorted:
        iou_sorted, valid_sorted = iou_matrix, valid
    else:
        order = jnp.argsort(jnp.where(valid, scores, _NEG), axis=-1)[..., ::-1]
        iou_sorted = jnp.take_along_axis(
            jnp.take_along_axis(iou_matrix, order[..., :, None], axis=-2),
            order[..., None, :], axis=-1)
        valid_sorted = jnp.take_along_axis(valid, order, axis=-1)

    idx = jnp.arange(n)
    # dominates[i, j]: a kept i would suppress j (higher rank, IoU above thr)
    dominates = (iou_sorted > iou_thr) & (idx[:, None] < idx[None, :])

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < n)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(keep[..., :, None] & dominates, axis=-2)
        return valid_sorted & ~suppressed, keep, it + 1

    init = (valid_sorted, ~valid_sorted, jnp.zeros((), jnp.int32))
    keep_sorted, _, _ = jax.lax.while_loop(cond, body, init)
    if presorted:
        return keep_sorted
    inv_order = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv_order, axis=-1)


def greedy_nms_from_iou(iou_matrix, scores, valid, iou_thr: float):
    """Unbatched :func:`greedy_nms_from_iou_batched` over ``(N, N)`` inputs."""
    return greedy_nms_from_iou_batched(iou_matrix, scores, valid, iou_thr)


def rotated_nms_bev(boxes_xywhr, scores, valid, iou_thr: float):
    """Rotated BEV NMS (parity: ``nms_gpu``, ``iou3d.cpp`` wrapper)."""
    iou = iou_ops.rotated_iou_bev(boxes_xywhr, boxes_xywhr)
    return greedy_nms_from_iou(iou, scores, valid, iou_thr)


def normal_nms_bev(boxes_xywhr, scores, valid, iou_thr: float):
    """Axis-aligned BEV NMS ignoring rotation (parity: ``nms_normal_gpu``)."""
    xy = boxes_xywhr[:, :2]
    wh = boxes_xywhr[:, 2:4]
    xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    iou = iou_ops.bbox_overlaps_2d(xyxy, xyxy)
    return greedy_nms_from_iou(iou, scores, valid, iou_thr)


def aligned_3d_nms(boxes_corner, scores, classes, valid, iou_thr: float):
    """Class-aware axis-aligned 3D NMS on ``(N, 6)`` corner-form boxes.

    Parity: ``aligned_3d_nms`` (``box3d_nms.py:91-138``) — the ScanNet head's
    test-time NMS.  IoU between different classes is zeroed, exactly like the
    reference's ``iou * (classes1 == classes2)``.
    """
    iou = iou_ops.axis_aligned_bbox_overlaps_3d(boxes_corner, boxes_corner)
    same_class = classes[:, None] == classes[None, :]
    iou = jnp.where(same_class, iou, 0.0)
    return greedy_nms_from_iou(iou, scores, valid, iou_thr)


@functools.partial(
    jax.jit,
    static_argnames=('score_thr', 'max_num', 'iou_thr', 'use_rotate_nms'))
def multiclass_nms_3d_exact(mlvl_bboxes,
                            mlvl_bboxes_for_nms,
                            mlvl_scores,
                            mlvl_valid,
                            *,
                            score_thr: float,
                            max_num: int,
                            iou_thr: float,
                            use_rotate_nms: bool = True,
                            mlvl_dir_scores=None):
    """Exact (untruncated) per-class rotated NMS over ALL candidates.

    Semantically identical to ``box3d_multiclass_nms`` (``box3d_nms.py:8-88``)
    with no candidate cap.  Key structural insight: the candidate *boxes* are
    the same for every class — only scores/validity differ — so the ``(N, N)``
    pairwise IoU matrix is computed once and every class reuses it through the
    fixpoint greedy (per-class work is then an argsort + a matrix gather, not
    a fresh rotated-clip pass).  For the score_thr=0 indoor presets (SUN RGB-D
    v2/v3) this removes the documented top-``pre_nms_k`` truncation entirely.
    """
    n, n_classes = mlvl_scores.shape
    if mlvl_dir_scores is None:
        mlvl_dir_scores = jnp.zeros((n,), mlvl_scores.dtype)

    if use_rotate_nms:
        iou = iou_ops.rotated_iou_bev(mlvl_bboxes_for_nms,
                                      mlvl_bboxes_for_nms)
    else:
        xy = mlvl_bboxes_for_nms[:, :2]
        wh = mlvl_bboxes_for_nms[:, 2:4]
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        iou = iou_ops.bbox_overlaps_2d(xyxy, xyxy)

    def per_class(c):
        cls_scores = mlvl_scores[:, c]
        cls_valid = mlvl_valid & (cls_scores > score_thr)
        return greedy_nms_from_iou(iou, cls_scores, cls_valid, iou_thr)

    keeps = jax.lax.map(per_class, jnp.arange(n_classes))    # (C, N)
    kept_scores = jnp.where(keeps, mlvl_scores.T, _NEG)      # (C, N)

    flat = kept_scores.reshape(-1)
    k_out = min(max_num, n_classes * n)
    top_scores, top_flat = jax.lax.top_k(flat, k_out)
    top_cls = top_flat // n
    top_idx = top_flat % n
    out = dict(
        boxes=mlvl_bboxes[top_idx],
        scores=jnp.maximum(top_scores, 0.0),
        labels=top_cls.astype(jnp.int32),
        dir_scores=mlvl_dir_scores[top_idx],
        valid=top_scores > _NEG / 2,
    )
    pad = max_num - k_out
    if pad:
        out = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=('score_thr', 'max_num', 'iou_thr', 'use_rotate_nms',
                     'pre_nms_k'))
def multiclass_nms_3d(mlvl_bboxes,
                      mlvl_bboxes_for_nms,
                      mlvl_scores,
                      mlvl_valid,
                      *,
                      score_thr: float,
                      max_num: int,
                      iou_thr: float,
                      use_rotate_nms: bool = True,
                      pre_nms_k: int = 256,
                      mlvl_dir_scores=None):
    """Per-class rotated NMS with fixed output size.

    Parity: ``box3d_multiclass_nms`` (``box3d_nms.py:8-88``).  The reference
    loops over foreground classes, thresholds scores, runs rotated NMS and
    finally keeps the ``max_num`` highest-scoring survivors; we do the same
    with a static per-class candidate cap ``pre_nms_k``.

    Tie ordering: candidate ranking comes from ``lax.top_k``, which breaks
    exact score ties lowest-index-first — i.e. the earlier candidate row wins
    and may suppress the later one.  This matches what a stable descending
    argsort (the pre-round-4 formulation, and torch ``sort`` in the
    reference's scoring path) produces, and is pinned by
    ``tests/test_nms.py::test_multiclass_nms_batched_equals_per_class_map``
    (which injects exact ties); for continuous float scores ties are
    measure-zero anyway.

    Args:
      mlvl_bboxes: ``(N, D)`` decoded boxes (D = 7 or 9).
      mlvl_bboxes_for_nms: ``(N, 5)`` BEV xywhr boxes used for suppression.
      mlvl_scores: ``(N, C)`` foreground class scores (no dummy column).
      mlvl_valid: ``(N,)`` bool validity of each candidate row.
      mlvl_dir_scores: optional ``(N,)``.

    Returns:
      dict with fixed-size arrays: ``boxes (max_num, D)``, ``scores``,
      ``labels``, ``dir_scores``, ``valid`` (all ``(max_num,)``).
    """
    n, n_classes = mlvl_scores.shape
    k = min(pre_nms_k, n)

    if mlvl_dir_scores is None:
        mlvl_dir_scores = jnp.zeros((n,), mlvl_scores.dtype)

    # All classes at once (no lax.map): one top_k over (C, N), one flattened
    # Pallas clip over all C*k*k pairs, one shared fixpoint while loop.  The
    # per-class lax.map version spent 11.8 ms/step of the SUN RGB-D `_fast`
    # b8 forward in loop control and launched C separate clip kernels
    # (round-4 trace).  top_k rows are descending => presorted greedy.
    masked = jnp.where(mlvl_valid[None, :] & (mlvl_scores.T > score_thr),
                       mlvl_scores.T, _NEG)                  # (C, N)
    top_scores, top_idx = jax.lax.top_k(masked, k)           # (C, k)
    top_valid = top_scores > _NEG / 2
    nms_boxes = mlvl_bboxes_for_nms[top_idx]                 # (C, k, 5)
    if use_rotate_nms:
        iou = iou_ops.rotated_iou_bev(nms_boxes, nms_boxes)  # (C, k, k)
    else:
        xy = nms_boxes[..., :2]
        wh = nms_boxes[..., 2:4]
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        iou = jax.vmap(iou_ops.bbox_overlaps_2d)(xyxy, xyxy)
    keeps = greedy_nms_from_iou_batched(iou, top_scores, top_valid, iou_thr,
                                        presorted=True)      # (C, k)
    boxes = mlvl_bboxes[top_idx]                             # (C, k, D)
    scores = top_scores
    labels = jnp.broadcast_to(
        jnp.arange(n_classes, dtype=jnp.int32)[:, None], (n_classes, k))
    dirs = mlvl_dir_scores[top_idx]
    boxes, scores, labels, dirs, keeps = jax.tree_util.tree_map(
        lambda x: x.reshape((n_classes * k,) + x.shape[2:]),
        (boxes, scores, labels, dirs, keeps))

    final_scores = jnp.where(keeps, scores, _NEG)
    k_out = min(max_num, n_classes * k)
    top_scores, top_idx = jax.lax.top_k(final_scores, k_out)
    pad = max_num - k_out
    out = dict(
        boxes=boxes[top_idx],
        scores=jnp.maximum(top_scores, 0.0),
        labels=labels[top_idx],
        dir_scores=dirs[top_idx],
        valid=top_scores > _NEG / 2,
    )
    if pad:
        out = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), out)
    return out
