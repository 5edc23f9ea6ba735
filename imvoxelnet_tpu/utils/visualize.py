"""Visualization: project predicted 3D boxes into the views as wireframes.

Parity: ``MultiViewMixin.show`` (``mmdet3d/datasets/dataset_wrappers.py:82-126``)
— box corners projected with the dataset-provided ``intrinsic @ extrinsic``
and drawn edge-by-edge into each image.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import boxes as box_ops

# edges of the reference's corner ordering
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0)
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
          (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_boxes(image, boxes, projection, color=(0, 255, 0), thickness=2):
    """Draw ``(N, 7)`` bottom-center boxes as wireframes on an RGB image.

    Args:
      image: HxWx3 uint8 (modified copy returned).
      projection: ``(3, 4)`` ``K @ E[:3]``.
    """
    import cv2
    import jax.numpy as jnp

    img = np.ascontiguousarray(image.copy())
    if len(boxes) == 0:
        return img
    corners = np.asarray(box_ops.corners(jnp.asarray(boxes, jnp.float32)))
    for box_corners in corners:
        pts4 = np.concatenate(
            [box_corners, np.ones((8, 1), np.float32)], axis=1)
        uvw = pts4 @ np.asarray(projection).T
        if np.any(uvw[:, 2] <= 0):
            continue
        uv = (uvw[:, :2] / uvw[:, 2:3]).astype(int)
        for a, b in _EDGES:
            cv2.line(img, tuple(uv[a]), tuple(uv[b]), color, thickness)
    return img


def export_boxes_obj(boxes, path):
    """Export ``(N, 7)`` bottom-center boxes as a wireframe .obj for MeshLab.

    Parity: the MeshLab-oriented dump of ``core/visualizer/show_result.py``
    (oriented boxes as line sets).
    """
    import jax.numpy as jnp

    corners = np.asarray(box_ops.corners(jnp.asarray(boxes, jnp.float32)))
    lines = []
    for b, cs in enumerate(corners):
        for x, y, z in cs:
            lines.append(f'v {x:.5f} {y:.5f} {z:.5f}')
    for b in range(len(corners)):
        off = b * 8 + 1
        for a, c in _EDGES:
            lines.append(f'l {off + a} {off + c}')
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return path


def show_multi_view_result(dataset, index, boxes, out_dir, scale_factor=1.0):
    """Render predictions into every view of a sample and save PNGs."""
    import cv2

    data = dataset.get_data_info(index)
    os.makedirs(out_dir, exist_ok=True)
    intrinsic = np.asarray(data['intrinsic'], np.float32)[:3, :3]
    paths = []
    for i, rel in enumerate(data['img_paths']):
        img = cv2.imread(os.path.join(dataset.data_root, rel))[:, :, ::-1]
        extrinsic = np.asarray(data['extrinsics'][i], np.float32)
        projection = intrinsic @ extrinsic[:3]
        img = draw_boxes(img, boxes, projection)
        out = os.path.join(out_dir, f'{index}_{i}.png')
        cv2.imwrite(out, img[:, :, ::-1])
        paths.append(out)
    return paths
