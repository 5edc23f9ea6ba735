import numpy as np
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.ops import boxes as box_ops
from imvoxelnet_tpu.ops import iou as iou_ops


def _mc_rect_intersection(b1, b2, n=400):
    """Brute-force rotated rect intersection area by grid sampling."""
    def contains(box, pts):
        x, y, w, h, r = box
        # inverse of the row-vector rotation used in bev_corners
        dx = pts[:, 0] - x
        dy = pts[:, 1] - y
        c, s = np.cos(r), np.sin(r)
        # local = world_offset @ M^{-1} with M = [[c, -s], [s, c]]
        lx = dx * c - dy * s
        ly = dx * s + dy * c
        return (np.abs(lx) <= w / 2) & (np.abs(ly) <= h / 2)

    lo = np.minimum(b1[:2], b2[:2]) - max(b1[2], b1[3], b2[2], b2[3])
    hi = np.maximum(b1[:2], b2[:2]) + max(b1[2], b1[3], b2[2], b2[3])
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], 1)
    cell = (hi[0] - lo[0]) / n * (hi[1] - lo[1]) / n
    return np.sum(contains(b1, pts) & contains(b2, pts)) * cell


def test_rect_intersection_matches_monte_carlo():
    rng = np.random.RandomState(0)
    for _ in range(20):
        b1 = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                       rng.uniform(0.5, 3), rng.uniform(0.5, 3),
                       rng.uniform(-np.pi, np.pi)])
        b2 = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                       rng.uniform(0.5, 3), rng.uniform(0.5, 3),
                       rng.uniform(-np.pi, np.pi)])
        c1 = box_ops.bev_corners(jnp.asarray(b1)[None])[0]
        c2 = box_ops.bev_corners(jnp.asarray(b2)[None])[0]
        area = float(iou_ops.rect_intersection_area(c1, c2))
        ref = _mc_rect_intersection(b1, b2)
        assert abs(area - ref) < 0.05, (b1, b2, area, ref)


def test_rect_intersection_identical_boxes():
    b = jnp.array([[0.5, -0.3, 2.0, 3.0, 0.7]])
    c = box_ops.bev_corners(b)
    area = float(iou_ops.rect_intersection_area(c[0], c[0]))
    np.testing.assert_allclose(area, 6.0, rtol=1e-4)


def test_rect_intersection_disjoint():
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b2 = jnp.array([[10.0, 10.0, 1.0, 1.0, -0.5]])
    c1 = box_ops.bev_corners(b1)[0]
    c2 = box_ops.bev_corners(b2)[0]
    assert float(iou_ops.rect_intersection_area(c1, c2)) == 0.0


def test_rect_intersection_contained():
    big = box_ops.bev_corners(jnp.array([[0.0, 0.0, 4.0, 4.0, 0.2]]))[0]
    small = box_ops.bev_corners(jnp.array([[0.0, 0.0, 1.0, 1.0, 1.0]]))[0]
    np.testing.assert_allclose(
        float(iou_ops.rect_intersection_area(big, small)), 1.0, rtol=1e-4)


def test_rotated_iou_axis_aligned_case():
    # with zero rotation this reduces to plain IoU
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = float(iou_ops.rotated_iou_bev(b1, b2)[0, 0])
    np.testing.assert_allclose(iou, 2.0 / 6.0, rtol=1e-4)


def test_iou_3d_aligned_identical():
    b = jnp.array([[1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 0.5]])
    np.testing.assert_allclose(
        float(iou_ops.iou_3d_aligned(b[0], b[0])), 1.0, rtol=1e-4)


def test_iou_3d_aligned_gradients_finite():
    b1 = jnp.array([1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 0.5])
    b2 = jnp.array([1.2, 2.1, 3.3, 2.5, 2.5, 3.5, 0.3])

    g = jax.grad(lambda x: iou_ops.iou_3d_aligned(x, b2))(b1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 0)


def test_bbox_overlaps_3d_vs_axis_aligned():
    # zero-yaw boxes: rotated 3D IoU must equal the axis-aligned formula
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[1.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],
                    [0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    got = np.asarray(iou_ops.bbox_overlaps_3d(b1, b2))
    c1 = jnp.concatenate([b1[:, :3] - b1[:, 3:6] / 2 * jnp.array([1, 1, 0.0]),
                          b1[:, :3] + b1[:, 3:6] * jnp.array([0.5, 0.5, 1.0])], -1)
    c2 = jnp.concatenate([b2[:, :3] - b2[:, 3:6] / 2 * jnp.array([1, 1, 0.0]),
                          b2[:, :3] + b2[:, 3:6] * jnp.array([0.5, 0.5, 1.0])], -1)
    exp = np.asarray(iou_ops.axis_aligned_bbox_overlaps_3d(c1, c2))
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_nearest_3d_overlaps_shape_and_range():
    rng = np.random.RandomState(1)
    b1 = jnp.asarray(rng.uniform(-1, 1, (5, 7)) * [5, 5, 1, 0, 0, 0, 3]
                     + [0, 0, 0, 2, 2, 2, 0]).astype(jnp.float32)
    b2 = jnp.asarray(rng.uniform(-1, 1, (4, 7)) * [5, 5, 1, 0, 0, 0, 3]
                     + [0, 0, 0, 2, 2, 2, 0]).astype(jnp.float32)
    out = np.asarray(iou_ops.bbox_overlaps_nearest_3d(b1, b2))
    assert out.shape == (5, 4)
    assert np.all(out >= 0) and np.all(out <= 1)


def test_giou_3d_loss_basics():
    from imvoxelnet_tpu.ops.losses import giou_3d_loss
    b1 = jnp.asarray([1., 2., 3., 2., 3., 4., 0.5])
    np.testing.assert_allclose(
        float(giou_3d_loss(b1, b1, avg_factor=1.0)), 0.0, atol=1e-5)
    b3 = jnp.asarray([10., 2., 3., 2., 3., 4., 0.1])
    loss = float(giou_3d_loss(b1, b3, avg_factor=1.0))
    assert loss > 1.0  # disjoint boxes: GIoU penalty beyond 1 - IoU
    g = jax.grad(lambda x: giou_3d_loss(x, b3, avg_factor=1.0))(b1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
