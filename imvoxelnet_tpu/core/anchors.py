"""3D anchor generation (pure jnp).

Parity: ``Anchor3DRangeGenerator.anchors_single_range``
(``mmdet3d/core/anchor/anchor_3d_generator.py:150-207``): linspace centers
over the anchor range (inclusive endpoints, feature-map-many points per axis)
x sizes x rotations, output ``(1, H, W, n_sizes, n_rots, box_dim)`` which
flattens row-major to the same order as a conv head's
``permute(0, 2, 3, 1).reshape(-1, ...)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def anchors_single_range(feature_size, anchor_range, sizes, rotations,
                         scale: float = 1.0, custom_values=()):
    """Generate anchors over one range.

    Args:
      feature_size: ``(H, W)`` or ``(D, H, W)`` of the BEV map (rows=y, cols=x).
      anchor_range: 6 floats ``(x0, y0, z0, x1, y1, z1)``.
      sizes: ``(n_sizes, 3)``.
      rotations: ``(n_rots,)``.

    Returns:
      ``(D, H, W, n_sizes, n_rots, 7 + len(custom_values))`` numpy array.
    """
    if len(feature_size) == 2:
        feature_size = (1, feature_size[0], feature_size[1])
    d, h, w = feature_size
    ar = np.asarray(anchor_range, np.float32)
    z = np.linspace(ar[2], ar[5], d, dtype=np.float32)
    y = np.linspace(ar[1], ar[4], h, dtype=np.float32)
    x = np.linspace(ar[0], ar[3], w, dtype=np.float32)
    sizes = np.asarray(sizes, np.float32).reshape(-1, 3) * scale
    rotations = np.asarray(rotations, np.float32)
    ns, nr = sizes.shape[0], rotations.shape[0]

    zz, yy, xx = np.meshgrid(z, y, x, indexing='ij')      # (D, H, W)
    centers = np.stack([xx, yy, zz], axis=-1)             # (D, H, W, 3)
    centers = np.broadcast_to(centers[:, :, :, None, None, :],
                              (d, h, w, ns, nr, 3))
    size_b = np.broadcast_to(sizes[None, None, None, :, None, :],
                             (d, h, w, ns, nr, 3))
    rot_b = np.broadcast_to(rotations[None, None, None, None, :, None],
                            (d, h, w, ns, nr, 1))
    anchors = np.concatenate([centers, size_b, rot_b], axis=-1)
    if custom_values:
        extra = np.zeros((d, h, w, ns, nr, len(custom_values)), np.float32)
        anchors = np.concatenate([anchors, extra], axis=-1)
    return anchors


def grid_anchors(featmap_size, ranges, sizes, rotations, custom_values=()):
    """Multi-range anchors, flattened ``(H*W*n_sizes*n_rots, box_dim)``.

    Each (range, size) pair contributes one anchor set, concatenated along the
    size axis (``anchor_3d_generator.py:131-146``).
    """
    sets = [
        anchors_single_range(featmap_size, r, [s], rotations,
                             custom_values=custom_values)
        for r, s in zip(ranges, sizes)
    ]
    anchors = np.concatenate(sets, axis=-3)  # stack over n_sizes
    return jnp.asarray(anchors.reshape(-1, anchors.shape[-1]))
