"""IoU computations (axis-aligned and rotated), fully differentiable jnp.

TPU-native replacements for the reference's native kernels:
  - ``boxes_iou_bev_gpu`` / ``boxes_overlap_bev_gpu``
    (``mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-345``) -> vectorised rotated
    rect intersection via exact convex-polygon vertex enumeration
    (exact rect-rect clipping; the CUDA ``sort_v`` vertex sort of
    ``mmdet3d/ops/rotated_iou/box_intersection_2d.py:11-166`` is replaced by
    a vectorised sort-free Sutherland-Hodgman clip — differentiable, no
    custom kernel needed).
  - ``bbox_overlaps`` (mmdet, axis-aligned 2D) and
    ``axis_aligned_bbox_overlaps_3d``
    (``mmdet3d/core/bbox/iou_calculators/iou3d_calculator.py:171-250``).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from . import boxes as box_ops

_EPS = 1e-8


def bbox_overlaps_2d(boxes1, boxes2, mode: str = 'iou', eps: float = 1e-6):
    """Pairwise axis-aligned 2D IoU; boxes ``(N, 4)`` xyxy -> ``(N, M)``."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    overlap = wh[..., 0] * wh[..., 1]
    if mode == 'iou':
        union = area1[..., :, None] + area2[..., None, :] - overlap
    elif mode == 'iof':
        union = jnp.broadcast_to(area1[..., :, None], overlap.shape)
    else:
        raise ValueError(mode)
    return overlap / jnp.maximum(union, eps)


def axis_aligned_bbox_overlaps_3d(boxes1, boxes2, mode: str = 'iou',
                                  is_aligned: bool = False, eps: float = 1e-6):
    """Axis-aligned 3D IoU/GIoU on ``(…, N, 6)`` corner-form boxes.

    Parity: ``iou3d_calculator.py:207-320`` (used by AxisAlignedIoULoss for
    the ScanNet heads).
    """
    area1 = ((boxes1[..., 3] - boxes1[..., 0]) * (boxes1[..., 4] - boxes1[..., 1])
             * (boxes1[..., 5] - boxes1[..., 2]))
    area2 = ((boxes2[..., 3] - boxes2[..., 0]) * (boxes2[..., 4] - boxes2[..., 1])
             * (boxes2[..., 5] - boxes2[..., 2]))
    if is_aligned:
        lt = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
        rb = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
        wh = jnp.clip(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1 + area2 - overlap
        enc_lt = jnp.minimum(boxes1[..., :3], boxes2[..., :3])
        enc_rb = jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
    else:
        lt = jnp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
        rb = jnp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
        wh = jnp.clip(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1[..., :, None] + area2[..., None, :] - overlap
        enc_lt = jnp.minimum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
        enc_rb = jnp.maximum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode == 'iou':
        return ious
    if mode != 'giou':
        raise ValueError(mode)
    enc_wh = jnp.clip(enc_rb - enc_lt, 0)
    enc = jnp.maximum(enc_wh[..., 0] * enc_wh[..., 1] * enc_wh[..., 2], eps)
    return ious - (enc - union) / enc


def bbox_overlaps_nearest_3d(boxes1, boxes2, mode: str = 'iou'):
    """Nearest-BEV IoU between ``(N, 7)`` and ``(M, 7)`` boxes.

    Parity: ``iou3d_calculator.py:94-140`` (``BboxOverlapsNearest3D`` — the
    MaxIoU assignment metric for the KITTI/nuScenes Anchor3DHead).
    """
    return bbox_overlaps_2d(
        box_ops.nearest_bev(boxes1), box_ops.nearest_bev(boxes2), mode=mode)


# ---------------------------------------------------------------------------
# Rotated rectangle intersection (exact, differentiable).
# ---------------------------------------------------------------------------

def _segment_intersections(corners1, corners2):
    """All 16 edge-edge intersection candidates of two rects.

    Args:
      corners1, corners2: ``(..., 4, 2)``.
    Returns:
      pts ``(..., 16, 2)``, mask ``(..., 16)``.
    """
    # edges: p -> q
    p1 = corners1
    q1 = jnp.roll(corners1, -1, axis=-2)
    p2 = corners2
    q2 = jnp.roll(corners2, -1, axis=-2)

    # broadcast to (..., 4, 4, 2): edge i of rect1 x edge j of rect2
    p1b = p1[..., :, None, :]
    q1b = q1[..., :, None, :]
    p2b = p2[..., None, :, :]
    q2b = q2[..., None, :, :]

    d1 = q1b - p1b
    d2 = q2b - p2b
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    safe = jnp.abs(denom) > 1e-10
    denom_safe = jnp.where(safe, denom, 1.0)
    w = p2b - p1b
    t = (w[..., 0] * d2[..., 1] - w[..., 1] * d2[..., 0]) / denom_safe
    u = (w[..., 0] * d1[..., 1] - w[..., 1] * d1[..., 0]) / denom_safe
    mask = safe & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p1b + t[..., None] * d1
    pts = jnp.where(mask[..., None], pts, 0.0)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), mask.reshape(shape[:-1])


def _points_in_rect(points, rect_corners):
    """Whether each of 4 ``points`` lies inside the (convex, CCW) rect."""
    a = rect_corners
    b = jnp.roll(rect_corners, -1, axis=-2)
    # cross of edge (a->b) with (a->p) for every point/edge pair (..., P, 4)
    ab = (b - a)[..., None, :, :]
    ap = points[..., :, None, :] - a[..., None, :, :]
    cross = ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]
    # inside convex polygon if all same sign (allow either orientation)
    return jnp.all(cross >= -1e-9, axis=-1) | jnp.all(cross <= 1e-9, axis=-1)


_SLOTS = 8  # rect ∩ rect has at most 8 vertices

# Pallas dispatch: the fused VMEM-resident kernel (``ops/iou_pallas.py``) wins
# when the pair count amortises its per-call cost — measured 13x at 9M pairs,
# ~1.4x at 1M, noise-level below (docs/performance.md).  The threshold keeps
# the KITTI per-class 100x100 matrices (clip cost already negligible there)
# on the XLA path, while the indoor 256x256-per-class NMS, the exact
# (untruncated) NMS and large eval matrices take the kernel.  Small problems
# and every CPU trace (tests, eval harnesses) also keep the XLA path.
_PALLAS_MIN_PAIRS = 65536


def _use_pallas(num_pairs: int) -> bool:
    import os
    flag = os.environ.get('IMVOXELNET_TPU_NO_PALLAS_IOU', '').lower()
    if flag not in ('', '0', 'false', 'no'):
        return False
    if num_pairs < _PALLAS_MIN_PAIRS:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


def rect_intersection_area(corners1, corners2):
    """Exact intersection area of two rotated rects, differentiable.

    Dispatches to the fused Pallas kernel on TPU for large pair counts (the
    NMS / eval matrices); the backward pass always differentiates the jnp
    implementation (``custom_vjp`` below), so gradients are unchanged.

    Dispatch caveats: the choice is made at *trace* time from
    ``jax.default_backend()`` and ``IMVOXELNET_TPU_NO_PALLAS_IOU`` — it is
    baked into jit caches (toggling the env var after a function has traced
    has no effect until retrace), and a trace explicitly targeting a
    non-default device (e.g. ``jit(..., device=cpu)`` on a TPU host) would
    still pick the Mosaic kernel.  Forward-mode AD (``jvp``) of the
    >= ``_PALLAS_MIN_PAIRS`` TPU path is unsupported (``custom_vjp`` has no
    jvp rule); use reverse mode, or set the env var before first trace.

    Vectorised sort-free Sutherland–Hodgman clip of rect1 against rect2's
    four edges, in structure-of-arrays layout: every working array is
    ``(8 slots, P pairs)`` with the flattened pair axis minor, so each op
    fills full 8x128 TPU vregs (the earlier array-of-structs layout with
    minor dims of 2/8 wasted ~98% of the VPU lanes and made the NMS IoU
    matrix the bottleneck).  Replaces the reference's CUDA vertex sort
    (``box_intersection_2d.py`` + ``sort_v``); gradients flow through the
    clipped vertex coordinates exactly like the reference's sorted-vertex
    gather.

    Args:
      corners1, corners2: ``(..., 4, 2)``.
    Returns:
      ``(...,)`` intersection areas.
    """
    batch = jnp.broadcast_shapes(corners1.shape[:-2], corners2.shape[:-2])
    num_pairs = int(np.prod(batch)) if batch else 1
    if _use_pallas(num_pairs):
        return _rect_intersection_area_hybrid(corners1, corners2)
    return _rect_intersection_area_jnp(corners1, corners2)


def _rect_intersection_area_jnp(corners1, corners2):
    """The pure-XLA clip (always used for gradients and small/CPU cases)."""
    batch = jnp.broadcast_shapes(corners1.shape[:-2], corners2.shape[:-2])
    c1 = jnp.broadcast_to(corners1, batch + (4, 2)).astype(jnp.float32)
    c2 = jnp.broadcast_to(corners2, batch + (4, 2)).astype(jnp.float32)
    p = int(np.prod(batch)) if batch else 1
    c1 = c1.reshape(p, 4, 2)
    c2 = c2.reshape(p, 4, 2)

    # SoA: (slots, P)
    zeros = jnp.zeros((_SLOTS - 4, p), jnp.float32)
    vx = jnp.concatenate([c1[:, :, 0].T, zeros], axis=0)
    vy = jnp.concatenate([c1[:, :, 1].T, zeros], axis=0)
    count = jnp.full((p,), 4, jnp.int32)
    cx2 = c2[:, :, 0].mean(axis=1)                         # (P,) rect2 center
    cy2 = c2[:, :, 1].mean(axis=1)
    slot_col = jnp.arange(_SLOTS)[:, None]                  # (8, 1)

    for e in range(4):
        ax = c2[:, e, 0]
        ay = c2[:, e, 1]
        abx = c2[:, (e + 1) % 4, 0] - ax
        aby = c2[:, (e + 1) % 4, 1] - ay
        ref = abx * (cy2 - ay) - aby * (cx2 - ax)
        sign = jnp.where(ref >= 0, 1.0, -1.0)               # (P,)

        s_cur = (abx * (vy - ay) - aby * (vx - ax)) * sign  # (8, P)
        active = slot_col < count[None, :]
        # next vertex: v[(i+1)] while i+1 < count else v[0]
        take_next = (slot_col + 1) < count[None, :]
        nvx = jnp.where(take_next, jnp.roll(vx, -1, axis=0), vx[0:1])
        nvy = jnp.where(take_next, jnp.roll(vy, -1, axis=0), vy[0:1])
        s_nxt = jnp.where(take_next, jnp.roll(s_cur, -1, axis=0), s_cur[0:1])

        inside_cur = s_cur >= 0
        inside_nxt = s_nxt >= 0
        emit_cur = active & inside_cur
        emit_int = active & (inside_cur != inside_nxt)

        denom = s_cur - s_nxt
        t = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        ix = vx + t * (nvx - vx)
        iy = vy + t * (nvy - vy)

        n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
        pos0 = jnp.cumsum(n_emit, axis=0) - n_emit          # exclusive cumsum
        pos1 = pos0 + emit_cur.astype(jnp.int32)

        # scatter: new[k] = Σ_i [pos0_i == k & emit_cur_i] v_i + [pos1_i == k
        # & emit_int_i] ipt_i — static 8x8 unroll of (P,)-lane fused ops
        new_vx = jnp.zeros_like(vx)
        new_vy = jnp.zeros_like(vy)
        for k in range(_SLOTS):
            m0 = ((pos0 == k) & emit_cur).astype(jnp.float32)
            m1 = ((pos1 == k) & emit_int).astype(jnp.float32)
            new_vx = new_vx.at[k].set(jnp.sum(m0 * vx + m1 * ix, axis=0))
            new_vy = new_vy.at[k].set(jnp.sum(m0 * vy + m1 * iy, axis=0))
        vx, vy = new_vx, new_vy
        count = jnp.sum(n_emit, axis=0)

    # shoelace: pad inactive slots with the first vertex to close the polygon
    active = slot_col < count[None, :]
    cvx = jnp.where(active, vx, vx[0:1])
    cvy = jnp.where(active, vy, vy[0:1])
    nvx = jnp.roll(cvx, -1, axis=0)
    nvy = jnp.roll(cvy, -1, axis=0)
    area = 0.5 * jnp.abs(jnp.sum(cvx * nvy - cvy * nvx, axis=0))
    area = jnp.where(count > 2, area, 0.0)
    return area.reshape(batch)


@jax.custom_vjp
def _rect_intersection_area_hybrid(corners1, corners2):
    # primal (undifferentiated) trace — the inference NMS / eval matrices.
    # Compaction variant read at trace time (same caveat as _use_pallas:
    # baked into jit caches); 'scatter' is the hardware-validated default,
    # 'shift' the binary-shift network (bit-identical, fewer ops).
    import os

    from . import iou_pallas
    return iou_pallas.rect_intersection_area_pallas(
        corners1, corners2,
        compaction=os.environ.get('IMVOXELNET_TPU_CLIP_COMPACT', 'scatter'))


def _hybrid_fwd(corners1, corners2):
    # differentiated traces never touch the kernel: the jnp clip is
    # bit-identical and lets XLA share residuals with the backward pass
    # (running Pallas here would just force a second full forward in _bwd).
    # Note: as a custom_vjp, forward-mode AD (jvp/jacfwd) of the >= 65536-pair
    # TPU path is unsupported — set IMVOXELNET_TPU_NO_PALLAS_IOU=1 for that.
    return _rect_intersection_area_jnp(corners1, corners2), (corners1,
                                                             corners2)


def _hybrid_bwd(residuals, g):
    corners1, corners2 = residuals
    _, vjp = jax.vjp(_rect_intersection_area_jnp, corners1, corners2)
    return vjp(g)


_rect_intersection_area_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def rotated_overlaps_bev(boxes_xywhr1, boxes_xywhr2):
    """Pairwise rotated BEV intersection areas ``(..., N, M)``.

    Parity: ``boxes_overlap_bev_gpu`` (``iou3d_kernel.cu:253-267``).  Leading
    batch dims (e.g. a class axis in multiclass NMS) broadcast — pairing is
    over the last box axis only, and the whole batch lands in ONE flattened
    Pallas clip call.
    """
    c1 = box_ops.bev_corners(boxes_xywhr1)
    c2 = box_ops.bev_corners(boxes_xywhr2)
    return rect_intersection_area(c1[..., :, None, :, :],
                                  c2[..., None, :, :, :])


def rotated_iou_bev(boxes_xywhr1, boxes_xywhr2):
    """Pairwise rotated BEV IoU ``(..., N, M)``.

    Parity: ``boxes_iou_bev_gpu`` (``iou3d_kernel.cu:268-283``).
    """
    inter = rotated_overlaps_bev(boxes_xywhr1, boxes_xywhr2)
    a1 = boxes_xywhr1[..., 2] * boxes_xywhr1[..., 3]
    a2 = boxes_xywhr2[..., 2] * boxes_xywhr2[..., 3]
    return inter / jnp.maximum(
        a1[..., :, None] + a2[..., None, :] - inter, _EPS)


def bbox_overlaps_3d(boxes1, boxes2, mode: str = 'iou'):
    """Pairwise rotated 3D IoU of ``(N, 7)`` vs ``(M, 7)`` bottom-center boxes.

    Parity: ``BaseInstance3DBoxes.overlaps`` (``base_box3d.py:385-443``) —
    rotated BEV intersection x z-interval overlap / volume union.  Used by the
    indoor evaluation protocol.
    """
    inter_bev = rotated_overlaps_bev(box_ops.bev(boxes1), box_ops.bev(boxes2))
    zmin1, zmax1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zmin2, zmax2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    z_overlap = jnp.clip(
        jnp.minimum(zmax1[:, None], zmax2[None, :])
        - jnp.maximum(zmin1[:, None], zmin2[None, :]), 0)
    inter = inter_bev * z_overlap
    vol1 = box_ops.volume(boxes1)
    vol2 = box_ops.volume(boxes2)
    if mode == 'iou':
        denom = vol1[:, None] + vol2[None, :] - inter
    elif mode == 'iof':
        denom = jnp.broadcast_to(vol1[:, None], inter.shape)
    else:
        raise ValueError(mode)
    return jnp.clip(inter / jnp.maximum(denom, _EPS), 0.0, 1.0)


def iou_3d_aligned(boxes1_gc, boxes2_gc):
    """Aligned (element-wise) rotated 3D IoU of gravity-center 7-DoF boxes.

    The differentiable training loss core — parity with ``cal_iou_3d``
    (``mmdet3d/ops/rotated_iou/oriented_iou_loss.py:86-110``) where boxes are
    ``(x, y, z_center, w, h, l, alpha)``.
    Args:
      boxes1_gc, boxes2_gc: ``(..., 7)`` with z at the gravity center.
    """
    bev1 = jnp.concatenate([boxes1_gc[..., 0:2], boxes1_gc[..., 3:5],
                            boxes1_gc[..., 6:7]], axis=-1)
    bev2 = jnp.concatenate([boxes2_gc[..., 0:2], boxes2_gc[..., 3:5],
                            boxes2_gc[..., 6:7]], axis=-1)
    # box2corners_th yaw convention (NOT bev_corners') — see
    # ops/boxes.py:bev_corners_loss and tests/test_loss_parity.py
    inter_bev = rect_intersection_area(
        box_ops.bev_corners_loss(bev1), box_ops.bev_corners_loss(bev2))
    zmax = jnp.minimum(boxes1_gc[..., 2] + boxes1_gc[..., 5] * 0.5,
                       boxes2_gc[..., 2] + boxes2_gc[..., 5] * 0.5)
    zmin = jnp.maximum(boxes1_gc[..., 2] - boxes1_gc[..., 5] * 0.5,
                       boxes2_gc[..., 2] - boxes2_gc[..., 5] * 0.5)
    inter = inter_bev * jnp.clip(zmax - zmin, 0)
    vol1 = boxes1_gc[..., 3] * boxes1_gc[..., 4] * boxes1_gc[..., 5]
    vol2 = boxes2_gc[..., 3] * boxes2_gc[..., 4] * boxes2_gc[..., 5]
    union = jnp.maximum(vol1 + vol2 - inter, _EPS)
    return inter / union
