import numpy as np
import jax.numpy as jnp

from imvoxelnet_tpu.ops import backproject as bp
from imvoxelnet_tpu.ops.backproject import get_points


def test_get_points_matches_reference_formula():
    n_voxels = (4, 6, 2)
    voxel_size = (0.5, 0.5, 0.5)
    origin = jnp.asarray([1.0, 2.0, 3.0])
    pts = np.asarray(bp.get_points(n_voxels, voxel_size, origin))
    assert pts.shape == (4, 6, 2, 3)
    # reference: points = idx * voxel_size + origin - n_voxels/2 * voxel_size
    exp0 = np.array([0, 0, 0]) * 0.5 + np.array([1, 2, 3]) - np.array([4, 6, 2]) / 2 * 0.5
    np.testing.assert_allclose(pts[0, 0, 0], exp0, atol=1e-6)
    exp_last = np.array([3, 5, 1]) * 0.5 + np.array([1, 2, 3]) - np.array([4, 6, 2]) / 2 * 0.5
    np.testing.assert_allclose(pts[3, 5, 1], exp_last, atol=1e-6)


def _numpy_backproject(features, points, projections):
    """Literal numpy port of the reference semantics (imvoxelnet.py:144-160)."""
    v, hf, wf, c = features.shape
    p = points.shape[0]
    volume = np.zeros((v, p, c), np.float32)
    valid_all = np.zeros((v, p), bool)
    for i in range(v):
        pts_h = np.concatenate([points, np.ones((p, 1), np.float32)], 1)
        uvw = (projections[i] @ pts_h.T)
        x = np.round(uvw[0] / uvw[2]).astype(int)
        y = np.round(uvw[1] / uvw[2]).astype(int)
        z = uvw[2]
        valid = (x >= 0) & (y >= 0) & (x < wf) & (y < hf) & (z > 0)
        volume[i][valid] = features[i, y[valid], x[valid]]
        valid_all[i] = valid
    cnt = valid_all.sum(0)
    out = volume.sum(0)
    seen = cnt > 0
    out[seen] = out[seen] / cnt[seen][:, None]
    out[~seen] = 0
    return out, seen


def test_backproject_matches_reference_semantics():
    rng = np.random.RandomState(0)
    v, hf, wf, c = 3, 12, 16, 8
    features = rng.randn(v, hf, wf, c).astype(np.float32)
    # simple pinhole projections looking down +z-ish with jitter
    projections = []
    for i in range(v):
        k = np.array([[20.0, 0, wf / 2], [0, 20.0, hf / 2], [0, 0, 1]], np.float32)
        e = np.eye(4, dtype=np.float32)[:3]
        e[0, 3] = 0.2 * i
        projections.append(k @ e)
    projections = np.stack(projections)
    points = bp.get_points((6, 6, 4), (0.3, 0.3, 0.3),
                           jnp.asarray([0.0, 0.0, 2.0]))
    points_flat = np.asarray(points).reshape(-1, 3)

    got_vol, got_valid = bp.backproject(
        jnp.asarray(features), jnp.asarray(points_flat), jnp.asarray(projections))
    exp_vol, exp_valid = _numpy_backproject(features, points_flat, projections)

    np.testing.assert_array_equal(np.asarray(got_valid), exp_valid)
    np.testing.assert_allclose(np.asarray(got_vol), exp_vol, atol=1e-5)
    assert np.asarray(got_valid).sum() > 10  # the setup actually hits voxels


def test_backproject_valid_hw_masks_padding():
    rng = np.random.RandomState(1)
    features = rng.randn(1, 8, 8, 4).astype(np.float32)
    k = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
    proj = (k @ np.eye(4, dtype=np.float32)[:3])[None]
    points = np.asarray(
        bp.get_points((4, 4, 2), (0.25, 0.25, 0.25), jnp.asarray([0.0, 0.0, 1.5]))
    ).reshape(-1, 3)

    full_vol, full_valid = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj))
    # restricting valid extent to 4x4 must equal slicing the feature map
    sl_vol, sl_valid = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(proj),
        valid_hw=jnp.asarray([4, 4]))
    exp_vol, exp_valid = _numpy_backproject(features[:, :4, :4], points, proj)
    np.testing.assert_array_equal(np.asarray(sl_valid), exp_valid)
    np.testing.assert_allclose(np.asarray(sl_vol), exp_vol, atol=1e-5)
    assert np.asarray(full_valid).sum() >= np.asarray(sl_valid).sum()


def test_compute_projection_intrinsic_rescale():
    intrinsic = jnp.asarray([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    extrinsics = jnp.eye(4)[None]
    proj = np.asarray(bp.compute_projection(intrinsic, extrinsics, ratio=2.0))
    assert proj.shape == (1, 3, 4)
    np.testing.assert_allclose(proj[0, 0, 0], 50.0)
    np.testing.assert_allclose(proj[0, 1, 2], 20.0)
    np.testing.assert_allclose(proj[0, 2, 2], 1.0)


def test_backproject_batch_matches_per_sample():
    """backproject_batch == vmap(backproject) for multi-view AND the V=1
    fast path (masked sums are means for a single view)."""
    rng = np.random.RandomState(1)
    for v in (1, 3):
        b, hf, wf, c = 2, 12, 16, 8
        feats = rng.randn(b, v, hf, wf, c).astype(np.float32)
        k = np.array([[12.0, 0, wf / 2], [0, 12.0, hf / 2], [0, 0, 1]],
                     np.float32)
        projs = np.zeros((b, v, 3, 4), np.float32)
        for i in range(b):
            for j in range(v):
                e = np.eye(4, dtype=np.float32)
                e[:3, 3] = rng.randn(3) * 0.1
                projs[i, j] = k @ e[:3]
        pts = np.stack([
            np.asarray(bp.get_points((4, 4, 4), (0.4, 0.4, 0.4),
                                     jnp.asarray([0.0, 0.0, 2.0 + 0.1 * i]))
                       ).reshape(-1, 3)
            for i in range(b)])
        hw = np.tile(np.asarray([hf, wf], np.int32), (b, 1))

        acc, cnt = bp.backproject_batch(
            jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(projs),
            jnp.asarray(hw))
        vol, seen = bp.mean_pool_from_sums(acc, cnt, n_views=v)
        vol = np.asarray(vol).transpose(1, 0, 2)     # (B, P, C)
        seen = np.asarray(seen).T                    # (B, P)

        for i in range(b):
            ref_vol, ref_seen = bp.backproject(
                jnp.asarray(feats[i]), jnp.asarray(pts[i]),
                jnp.asarray(projs[i]), jnp.asarray(hw[i]))
            np.testing.assert_allclose(vol[i], np.asarray(ref_vol), atol=1e-5)
            np.testing.assert_array_equal(seen[i], np.asarray(ref_seen))


def test_onehot_matches_gather():
    """The MXU one-hot formulation must agree with the gather path (bf16
    feature precision) on a multi-view case with out-of-view voxels."""
    rng = np.random.RandomState(7)
    feats = rng.randn(3, 8, 16, 32).astype(np.float32)
    pts = get_points((10, 12, 4), (0.4, 0.4, 0.4),
                     np.array([0.0, 0.0, 1.0], np.float32)).reshape(-1, 3)
    projs = []
    for i in range(3):
        k = np.array([[20.0, 0, 8], [0, 20.0, 4], [0, 0, 1]], np.float32)
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.3 * i
        projs.append(k @ e[:3])
    projs = np.stack(projs)

    vol_ref, seen_ref = bp.backproject(
        jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(pts),
        jnp.asarray(projs))
    vol_oh, seen_oh = bp.backproject_onehot(
        jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(projs), block=128)
    np.testing.assert_array_equal(np.asarray(seen_ref), np.asarray(seen_oh))
    np.testing.assert_allclose(np.asarray(vol_ref, np.float32),
                               np.asarray(vol_oh, np.float32),
                               rtol=2e-2, atol=2e-2)
