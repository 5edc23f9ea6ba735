"""Anchor generator semantics (reference test_anchors.py analog)."""

import numpy as np

from imvoxelnet_tpu.core import anchors as anchor_gen


RANGES = ((0, -39.68, -0.6, 70.4, 39.68, -0.6),
          (0, -39.68, -0.6, 70.4, 39.68, -0.6),
          (0, -39.68, -1.78, 70.4, 39.68, -1.78))
SIZES = ((0.6, 0.8, 1.73), (0.6, 1.76, 1.73), (1.6, 3.9, 1.56))
ROTS = (0.0, 1.57)


def test_multi_range_anchor_shape():
    a = anchor_gen.grid_anchors((256, 256), RANGES, SIZES, ROTS)
    # (H * W * n_sizes * n_rots, 7), matching the reference's
    # [1, 256, 256, 3, 2, 7] reshaped
    assert a.shape == (256 * 256 * 3 * 2, 7)


def test_anchor_centers_linspace_and_order():
    h, w = 4, 5
    a = np.asarray(anchor_gen.grid_anchors((h, w), RANGES, SIZES, ROTS))
    a = a.reshape(h, w, 3, 2, 7)
    # row 0 col 0: y at range start, x at range start
    np.testing.assert_allclose(a[0, 0, 0, 0, :3], [0, -39.68, -0.6],
                               atol=1e-5)
    # last col: x at range end (inclusive linspace)
    np.testing.assert_allclose(a[0, -1, 0, 0, 0], 70.4, atol=1e-4)
    # last row: y at range end
    np.testing.assert_allclose(a[-1, 0, 0, 0, 1], 39.68, atol=1e-4)
    # size axis ordering matches the SIZES tuple; z comes from each range
    for s in range(3):
        np.testing.assert_allclose(a[0, 0, s, 0, 3:6], SIZES[s], atol=1e-6)
    np.testing.assert_allclose(a[0, 0, 2, 0, 2], -1.78, atol=1e-6)
    # rotation axis is fastest after sizes
    np.testing.assert_allclose(a[0, 0, 0, 1, 6], 1.57, atol=1e-6)
    np.testing.assert_allclose(a[0, 0, 0, 0, 6], 0.0, atol=1e-6)


def test_kitti_config_anchor_grid():
    """The flagship config's anchors: centers span the configured range
    (imvoxelnet_kitti.py:28-33) over the (246, 214) BEV map."""
    ranges = ((0, -39.68, -1.78, 69.12 - .32, 39.68 - .32, -1.78),)
    a = np.asarray(anchor_gen.grid_anchors(
        (246, 214), ranges, ((1.6, 3.9, 1.56),), ROTS))
    assert a.shape == (246 * 214 * 2, 7)
    assert np.isclose(a[:, 0].min(), 0.0) and np.isclose(
        a[:, 0].max(), 68.8, atol=1e-3)
    assert np.isclose(a[:, 2].min(), -1.78)
