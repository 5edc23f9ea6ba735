"""Functional 3D box geometry for TPU.

Boxes are plain ``(N, 7)`` jnp arrays ``(x, y, z, dx, dy, dz, yaw)`` with the
*bottom-center* convention (the relative origin inside the box is
``(0.5, 0.5, 0)``), matching the reference semantics of
``mmdet3d/core/bbox/structures/base_box3d.py:38-67``.  There is no class
hierarchy: the Depth/LiDAR/Camera distinction of the reference collapses to a
couple of mode-dependent helpers, everything else is mode-independent pure
functions that compile under ``jax.jit`` with static shapes.

Reference parity targets (file:line in /root/reference):
  - ``limit_period``              core/bbox/structures/utils.py:5-18
  - ``rotation_3d_in_axis``       core/bbox/structures/utils.py:21-61
  - ``xywhr2xyxyr``               core/bbox/structures/utils.py:64-83
  - ``points_cam2img``            core/bbox/structures/utils.py:117-131
  - ``corners`` / ``gravity_center`` / ``bev`` / ``nearest_bev``
                                  core/bbox/structures/depth_box3d.py:37-111,
                                  lidar_box3d.py (identical layout)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def limit_period(val, offset: float = 0.5, period: float = PI):
    """Limit angles into ``[-offset*period, (1-offset)*period)``."""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_2d(angles):
    """Row-vector 2D rotation used throughout the reference.

    ``p_new = p @ M`` with ``M = [[cos, -sin], [sin, cos]]`` — this matches the
    einsum convention of the reference ``rotation_3d_in_axis`` for axis=2.
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotation_3d_in_axis(points, angles, axis: int = 0):
    """Rotate ``(N, M, 3)`` points by per-row ``(N,)`` angles about ``axis``.

    Row-vector convention identical to the reference einsum
    (``core/bbox/structures/utils.py:21-61``): ``out = points @ M`` with, for
    ``axis == 2``, ``M = [[c, -s, 0], [s, c, 0], [0, 0, 1]]``.
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    ones = jnp.ones_like(c)
    zeros = jnp.zeros_like(c)
    # axis=0/1 matrices reproduce the reference *verbatim*, quirks included
    # (pinned by tests/test_boxes_golden.py): axis=0 additionally permutes
    # the output axes (out_x = p_z), and axis=1 rotates with the opposite
    # sign from axis=2 — upstream conventions the camera-box pipeline
    # depends on.  Every in-repo hot-path caller uses axis=2.
    if axis == 1:
        rows = [
            jnp.stack([c, zeros, -s], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([s, zeros, c], axis=-1),
        ]
    elif axis in (2, -1):
        rows = [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ]
    elif axis == 0:
        rows = [
            jnp.stack([zeros, c, -s], axis=-1),
            jnp.stack([zeros, s, c], axis=-1),
            jnp.stack([ones, zeros, zeros], axis=-1),
        ]
    else:
        raise ValueError(f'axis should be in [0, 1, 2], got {axis}')
    mat = jnp.stack(rows, axis=-2)  # (N, 3, 3), mat[n, j, k]
    # geometry must stay exact on TPU — default MXU precision is bf16
    return jnp.einsum('nmj,njk->nmk', points, mat,
                      precision=jax.lax.Precision.HIGHEST)


def xywhr2xyxyr(boxes_xywhr):
    """Convert rotated BEV boxes (x, y, w, h, r) -> (x1, y1, x2, y2, r)."""
    x, y, w, h, r = jnp.split(boxes_xywhr, 5, axis=-1)
    return jnp.concatenate(
        [x - w / 2, y - h / 2, x + w / 2, y + h / 2, r], axis=-1)


def volume(boxes):
    """Per-box volume (``base_box3d.py:69-72``)."""
    return boxes[..., 3] * boxes[..., 4] * boxes[..., 5]


def gravity_center(boxes):
    """Bottom-center box -> gravity (true) center (``depth_box3d.py:37-43``)."""
    return jnp.concatenate(
        [boxes[..., :2], (boxes[..., 2:3] + boxes[..., 5:6] * 0.5)], axis=-1)


def with_gravity_center(boxes):
    """``(x, y, z_bottom, dx, dy, dz, yaw)`` -> ``(cx, cy, cz, dx, dy, dz, yaw)``."""
    return jnp.concatenate([gravity_center(boxes), boxes[..., 3:]], axis=-1)


def to_bottom_center(boxes_gc):
    """Gravity-center boxes back to the bottom-center convention."""
    z_bottom = boxes_gc[..., 2:3] - boxes_gc[..., 5:6] * 0.5
    return jnp.concatenate(
        [boxes_gc[..., :2], z_bottom, boxes_gc[..., 3:]], axis=-1)


def bev(boxes):
    """Rotated BEV box (x, y, dx, dy, yaw) (``depth_box3d.py:87-90``)."""
    return boxes[..., jnp.array([0, 1, 3, 4, 6])]


def nearest_bev(boxes):
    """Axis-aligned (rotation-snapped) BEV box (x1, y1, x2, y2).

    Matches ``lidar_box3d.py:93-111`` / ``depth_box3d.py:93-111``: the yaw is
    normalised to ``[-pi/2, pi/2)``; if ``|yaw| > pi/4`` the BEV extents swap.
    """
    b = bev(boxes)
    rot = jnp.abs(limit_period(b[..., 4], 0.5, PI))
    swap = (rot > PI / 4)[..., None]
    wh = jnp.where(swap, b[..., jnp.array([3, 2])], b[..., 2:4])
    centers = b[..., :2]
    return jnp.concatenate([centers - wh / 2, centers + wh / 2], axis=-1)


# Corner ordering of the reference (``depth_box3d.py:46-84``):
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0)
_CORNERS_NORM = jnp.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ],
    dtype=jnp.float32,
)


def corners(boxes):
    """8 corners of bottom-center boxes, rotated about z (``(N, 8, 3)``)."""
    dims = boxes[..., 3:6]
    # center the template at (0.5, 0.5, 0) like the reference
    corners_norm = _CORNERS_NORM - jnp.array([0.5, 0.5, 0.0], jnp.float32)
    pts = corners_norm[None] * dims[..., None, :]
    pts = rotation_3d_in_axis(pts, boxes[..., 6], axis=2)
    return pts + boxes[..., None, :3]


def bev_corners(boxes_xywhr):
    """4 BEV corners of rotated rects ``(N, 4, 2)`` in CCW order.

    Yaw convention: ``rotation_3d_in_axis`` / the iou3d CUDA kernel
    (``boxes_overlap_bev_gpu``) — the reference's box structures, NMS and
    ``BaseInstance3DBoxes.overlaps`` all rotate this way (pinned by the
    lifted IoU goldens in ``tests/test_boxes_golden.py:test_overlaps_3d_golden``).
    The rotated-IoU *loss* extension rotates the other way — see
    :func:`bev_corners_loss`.
    """
    x, y, w, h, r = (boxes_xywhr[..., i] for i in range(5))
    # template corners in CCW order
    tx = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    ty = jnp.stack([h / 2, h / 2, -h / 2, -h / 2], axis=-1)
    c, s = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    # row-vector rotation: (tx, ty) @ [[c, -s], [s, c]]
    rx = tx * c + ty * s
    ry = -tx * s + ty * c
    return jnp.stack([rx + x[..., None], ry + y[..., None]], axis=-1)


def bev_corners_loss(boxes_xywhr):
    """4 BEV corners in the rotated-IoU *loss* extension's yaw convention.

    Parity: ``box2corners_th`` (``ops/rotated_iou/oriented_iou_loss.py:6-35``)
    rotates corners by ``p @ [[c, s], [-s, c]]`` — the OPPOSITE yaw direction
    from ``rotation_3d_in_axis``/:func:`bev_corners`.  The reference is
    internally inconsistent here; the IoU3D/GIoU3D training losses use this
    convention, so loss parity requires reproducing it (caught by
    ``tests/test_loss_parity.py``).
    """
    x, y, w, h, r = (boxes_xywhr[..., i] for i in range(5))
    tx = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    ty = jnp.stack([h / 2, h / 2, -h / 2, -h / 2], axis=-1)
    c, s = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    rx = tx * c - ty * s
    ry = tx * s + ty * c
    return jnp.stack([rx + x[..., None], ry + y[..., None]], axis=-1)


def points_cam2img(points_3d, proj_mat):
    """Project ``(..., 3)`` points with a ``(4, 4)`` or ``(3, 4)`` matrix."""
    ones = jnp.ones_like(points_3d[..., :1])
    pts4 = jnp.concatenate([points_3d, ones], axis=-1)
    pts2 = pts4 @ proj_mat.T
    return pts2[..., :2] / pts2[..., 2:3]


def rotate_boxes(boxes, angle, mode: str = 'lidar', points=None):
    """Rotate ``(N, 7)`` boxes (and optional ``(M, >=3)`` points) in-plane.

    Pure-function twin of the reference's per-mode ``rotate``
    (``lidar_box3d.py:113-151``, ``cam_box3d.py:168-203``,
    ``depth_box3d.py:113-157``): xyz multiplied by the mode's ``rot_mat_T``
    on the right; yaw ``+= angle`` for lidar/cam, ``-= angle`` for depth.

    Returns ``(boxes, points, rot_mat_T)`` (``points`` is None if not given).
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    if mode == 'lidar':
        rot_mat_t = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        yaw = boxes[..., 6] + angle
    elif mode == 'cam':
        rot_mat_t = jnp.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
        yaw = boxes[..., 6] + angle
    elif mode == 'depth':
        rot_mat_t = jnp.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
        yaw = boxes[..., 6] - angle
    else:
        raise ValueError(mode)
    xyz = boxes[..., :3] @ rot_mat_t
    out = jnp.concatenate([xyz, boxes[..., 3:6], yaw[..., None]], axis=-1)
    if points is not None:
        points = jnp.concatenate(
            [points[..., :3] @ rot_mat_t, points[..., 3:]], axis=-1)
    return out, points, rot_mat_t


# per-mode BEV flip: (axis negated for 'horizontal', for 'vertical')
_FLIP_AXES = {'lidar': (1, 0), 'cam': (0, 2), 'depth': (0, 1)}


def flip_boxes(boxes, direction: str = 'horizontal', mode: str = 'lidar',
               points=None):
    """BEV flip of ``(N, 7)`` boxes (and optional points).

    Parity: per-mode ``flip`` (``lidar_box3d.py:153-186``, ``cam_box3d.py:
    204-238``, ``depth_box3d.py:159-196``): one coordinate axis negated and
    ``yaw -> -yaw + pi`` (horizontal) / ``yaw -> -yaw`` (vertical), with no
    period limiting.
    """
    axis = _FLIP_AXES[mode][0 if direction == 'horizontal' else 1]
    sign = jnp.ones((3,), boxes.dtype).at[axis].set(-1.0)
    xyz = boxes[..., :3] * sign
    yaw = -boxes[..., 6] + (PI if direction == 'horizontal' else 0.0)
    out = jnp.concatenate([xyz, boxes[..., 3:6], yaw[..., None]], axis=-1)
    if points is not None:
        points = jnp.concatenate(
            [points[..., :3] * sign, points[..., 3:]], axis=-1)
    return out, points


def in_range_bev(boxes, box_range):
    """BEV range check (x_min, y_min, x_max, y_max), matches
    ``lidar_box3d.py`` ``in_range_bev`` semantics (strict inequalities)."""
    return ((boxes[..., 0] > box_range[0]) & (boxes[..., 1] > box_range[1])
            & (boxes[..., 0] < box_range[2]) & (boxes[..., 1] < box_range[3]))
