"""Native C++ eval kernels vs the numpy implementations."""

import numpy as np
import pytest

from imvoxelnet_tpu import native
from imvoxelnet_tpu.eval import kitti_eval as ke

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason='no C++ toolchain')


def test_rect_intersection_matches_numpy():
    rng = np.random.RandomState(0)
    b1 = np.concatenate([rng.uniform(-2, 2, (16, 2)),
                         rng.uniform(0.5, 3, (16, 2)),
                         rng.uniform(-np.pi, np.pi, (16, 1))], 1)
    b2 = np.concatenate([rng.uniform(-2, 2, (12, 2)),
                         rng.uniform(0.5, 3, (12, 2)),
                         rng.uniform(-np.pi, np.pi, (12, 1))], 1)
    got = native.rect_intersection_areas(b1, b2)
    exp = ke._rect_intersection_np(ke._rect_corners(b1), ke._rect_corners(b2))
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_compute_statistics_matches_numpy():
    rng = np.random.RandomState(1)
    n_gt, n_dt = 6, 9
    overlaps = rng.uniform(0, 1, (n_dt, n_gt))
    gt_datas = np.concatenate(
        [rng.uniform(0, 300, (n_gt, 4)), rng.uniform(-3, 3, (n_gt, 1))], 1)
    dt_scores = rng.uniform(0, 1, n_dt)
    dt_datas = np.concatenate(
        [rng.uniform(0, 300, (n_dt, 4)), rng.uniform(-3, 3, (n_dt, 1)),
         dt_scores[:, None]], 1)
    ignored_gt = rng.choice([-1, 0, 1], n_gt)
    ignored_det = rng.choice([-1, 0, 1], n_dt)
    dc = np.zeros((0, 4))
    thresholds = np.sort(rng.uniform(0, 1, 7))[::-1].copy()

    exp_pr = np.zeros((len(thresholds), 4))
    for t, thr in enumerate(thresholds):
        tp, fp, fn, sim, _ = ke.compute_statistics(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc,
            metric=2, min_overlap=0.4, thresh=thr, compute_fp=True,
            compute_aos=True)
        exp_pr[t] += [tp, fp, fn, sim if sim != -1 else 0]

    got_pr = np.zeros((len(thresholds), 4))
    native.compute_statistics_thresholds(
        overlaps, dt_scores, dt_datas[:, 4], gt_datas[:, 4],
        ignored_gt.astype(np.int64), ignored_det.astype(np.int64),
        np.zeros((n_dt, 0)), 0.4, thresholds, 1, got_pr)
    np.testing.assert_allclose(got_pr, exp_pr, atol=1e-9)


def test_native_nms_matches_numpy_greedy():
    import jax.numpy as jnp
    from imvoxelnet_tpu.ops import iou as iou_ops
    from imvoxelnet_tpu.ops import nms as nms_ops

    rng = np.random.RandomState(2)
    n = 24
    boxes = np.concatenate([rng.uniform(0, 8, (n, 2)),
                            rng.uniform(1, 3, (n, 2)),
                            rng.uniform(-1, 1, (n, 1))], 1)
    scores = rng.uniform(0, 1, n)
    keep_native = native.rotated_nms_host(boxes, scores, 0.3)

    iou = iou_ops.rotated_iou_bev(jnp.asarray(boxes, jnp.float32),
                                  jnp.asarray(boxes, jnp.float32))
    keep_jax = np.asarray(nms_ops.greedy_nms_from_iou(
        iou, jnp.asarray(scores, jnp.float32), jnp.ones(n, bool), 0.3))
    np.testing.assert_array_equal(keep_native, keep_jax)


def test_fused_normalize_pad_bit_parity():
    """image_ops.cc single-pass == numpy normalize+pad, bit-exact."""
    import pytest

    from imvoxelnet_tpu.data import pipeline as pl

    if native.load_image_ops() is None:
        pytest.skip('no compiler available')

    rng = np.random.RandomState(0)
    for (h, w), (ph, pw) in [((96, 320), (96, 320)),   # no padding
                             ((93, 317), (96, 320)),   # right+bottom pad
                             ((1, 1), (8, 8))]:        # degenerate
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        fused = native.normalize_pad_u8(img, pl.IMAGENET_MEAN,
                                        pl.IMAGENET_STD, (ph, pw))
        ref = pl.pad_to(pl.normalize(img), (ph, pw))
        assert fused.dtype == np.float32
        np.testing.assert_array_equal(fused, ref.astype(np.float32))


def test_process_image_uses_identical_values_with_and_without_native():
    """The pipeline output is invariant to the native fast path."""
    from imvoxelnet_tpu.data import pipeline as pl

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (100, 330, 3), np.uint8)
    cfg = pl.ImagePipelineConfig(test_scale=(320, 96), pad_size=(96, 320))
    out_a, info_a = pl.process_image(img, cfg, train=False,
                                     rng=np.random.RandomState(0))
    # force the numpy fallback by monkeypatching the native entry
    orig = native.normalize_pad_u8
    try:
        native.normalize_pad_u8 = lambda *a, **k: None
        out_b, info_b = pl.process_image(img, cfg, train=False,
                                         rng=np.random.RandomState(0))
    finally:
        native.normalize_pad_u8 = orig
    assert info_a == info_b
    np.testing.assert_array_equal(out_a.astype(np.float32),
                                  out_b.astype(np.float32))


def test_fused_normalize_pad_rejects_oversize_image():
    """Oversize inputs fall back (None) so pad_to's assert stays loud."""
    import pytest

    from imvoxelnet_tpu.data import pipeline as pl

    if native.load_image_ops() is None:
        pytest.skip('no compiler available')
    img = np.zeros((100, 100, 3), np.uint8)
    assert native.normalize_pad_u8(img, pl.IMAGENET_MEAN, pl.IMAGENET_STD,
                                   (96, 320)) is None
    assert native.normalize_pad_u8(img, pl.IMAGENET_MEAN, pl.IMAGENET_STD,
                                   (320, 96)) is None
