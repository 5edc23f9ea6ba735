"""Pallas rotated-clip kernel vs the XLA reference implementation.

The kernel runs the identical sort-free Sutherland-Hodgman algorithm, so
agreement must be exact-ish in fp32 (same ops, same order).  On the CPU test
mesh the kernel executes in the Pallas interpreter (``interpret=None`` auto).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imvoxelnet_tpu.ops import boxes as box_ops
from imvoxelnet_tpu.ops import iou as iou_ops
from imvoxelnet_tpu.ops.iou_pallas import rect_intersection_area_pallas


def _random_rects(rng, n):
    xy = rng.uniform(-4, 4, (n, 2))
    wh = rng.uniform(0.3, 3.0, (n, 2))
    r = rng.uniform(-np.pi, np.pi, (n, 1))
    return np.concatenate([xy, wh, r], axis=1).astype(np.float32)


@pytest.mark.parametrize('compaction', ['scatter', 'shift'])
def test_pallas_clip_matches_jnp_pairwise(compaction):
    rng = np.random.RandomState(0)
    b1 = _random_rects(rng, 60)
    b2 = _random_rects(rng, 40)
    c1 = box_ops.bev_corners(jnp.asarray(b1))
    c2 = box_ops.bev_corners(jnp.asarray(b2))
    ref = iou_ops._rect_intersection_area_jnp(c1[:, None], c2[None, :])
    got = rect_intersection_area_pallas(c1[:, None], c2[None, :],
                                        compaction=compaction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_shift_compaction_bit_identical_to_scatter():
    """The shift network is a pure re-routing: areas must be bit-equal."""
    rng = np.random.RandomState(7)
    b1 = _random_rects(rng, 48)
    b2 = _random_rects(rng, 48)
    c1 = box_ops.bev_corners(jnp.asarray(b1))
    c2 = box_ops.bev_corners(jnp.asarray(b2))
    a_scatter = np.asarray(rect_intersection_area_pallas(
        c1[:, None], c2[None, :], compaction='scatter'))
    a_shift = np.asarray(rect_intersection_area_pallas(
        c1[:, None], c2[None, :], compaction='shift'))
    assert (a_scatter == a_shift).all()


def test_pallas_clip_degenerate_cases():
    # identical, disjoint, touching, contained - one aligned batch
    boxes1 = jnp.asarray([
        [0., 0., 2., 2., 0.3],
        [0., 0., 2., 2., 0.0],
        [0., 0., 2., 2., 0.0],
        [0., 0., 4., 4., 0.0],
    ], jnp.float32)
    boxes2 = jnp.asarray([
        [0., 0., 2., 2., 0.3],   # identical -> area 4
        [10., 10., 2., 2., 0.0], # disjoint -> 0
        [2., 0., 2., 2., 0.0],   # edge-touching -> 0
        [0., 0., 1., 1., 1.0],   # contained -> 1
    ], jnp.float32)
    c1 = box_ops.bev_corners(boxes1)
    c2 = box_ops.bev_corners(boxes2)
    got = np.asarray(rect_intersection_area_pallas(c1, c2))
    np.testing.assert_allclose(got, [4.0, 0.0, 0.0, 1.0], atol=1e-5)


def test_pallas_clip_nonmultiple_tile_padding():
    rng = np.random.RandomState(1)
    b1 = _random_rects(rng, 7)
    b2 = _random_rects(rng, 11)
    c1 = box_ops.bev_corners(jnp.asarray(b1))
    c2 = box_ops.bev_corners(jnp.asarray(b2))
    ref = iou_ops._rect_intersection_area_jnp(c1[:, None], c2[None, :])
    got = rect_intersection_area_pallas(c1[:, None], c2[None, :], tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_custom_vjp_gradients_match_jnp():
    rng = np.random.RandomState(2)
    b1 = jnp.asarray(_random_rects(rng, 96))
    b2 = jnp.asarray(_random_rects(rng, 96))
    c1 = box_ops.bev_corners(b1)
    c2 = box_ops.bev_corners(b2)

    def loss_hybrid(c1, c2):
        return jnp.sum(iou_ops._rect_intersection_area_hybrid(
            c1[:, None], c2[None, :]))

    def loss_jnp(c1, c2):
        return jnp.sum(iou_ops._rect_intersection_area_jnp(
            c1[:, None], c2[None, :]))

    v_h, g_h = jax.value_and_grad(loss_hybrid, argnums=(0, 1))(c1, c2)
    v_j, g_j = jax.value_and_grad(loss_jnp, argnums=(0, 1))(c1, c2)
    np.testing.assert_allclose(float(v_h), float(v_j), rtol=1e-5)
    for gh, gj in zip(g_h, g_j):
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gj),
                                   rtol=1e-4, atol=1e-5)


def test_dispatch_gating():
    # CPU backend never routes to the compiled kernel
    assert not iou_ops._use_pallas(1 << 20) or \
        jax.default_backend() == 'tpu'
    # small problems always stay on the XLA path
    assert not iou_ops._use_pallas(16)


def test_dispatch_env_flag_spelling():
    """NO_PALLAS_IOU=0/false means 'not disabled' (flag is a negation)."""
    import os
    for off_spelling in ('0', 'false', 'no', ''):
        os.environ['IMVOXELNET_TPU_NO_PALLAS_IOU'] = off_spelling
        try:
            # CPU backend still gates to False; assert the flag itself does
            # not force-disable by checking the disabled spellings differ
            enabled = iou_ops._use_pallas(1 << 20)
            os.environ['IMVOXELNET_TPU_NO_PALLAS_IOU'] = '1'
            assert iou_ops._use_pallas(1 << 20) is False
            if jax.default_backend() == 'tpu':
                assert enabled
        finally:
            del os.environ['IMVOXELNET_TPU_NO_PALLAS_IOU']


def test_pallas_clip_compiled_parity_on_tpu():
    """Mosaic-compiled kernel vs the XLA clip on real hardware.

    Skipped on the CPU mesh (interpret mode is covered above); on a TPU
    backend this pins the compiled lowering — the hardware microbench
    (tools/bench_iou_kernel.py) showed bit-matching sums, this automates it.
    """
    if jax.default_backend() != 'tpu':
        pytest.skip('needs a TPU backend')
    rng = np.random.RandomState(3)
    b1 = _random_rects(rng, 300)
    b2 = _random_rects(rng, 300)
    c1 = box_ops.bev_corners(jnp.asarray(b1))
    c2 = box_ops.bev_corners(jnp.asarray(b2))
    ref = iou_ops._rect_intersection_area_jnp(c1[:, None], c2[None, :])
    for compaction in ('scatter', 'shift'):
        got = rect_intersection_area_pallas(c1[:, None], c2[None, :],
                                            interpret=False,
                                            compaction=compaction)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=compaction)
