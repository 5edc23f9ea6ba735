"""View-parallel backprojection over an 8-device mesh must match single-chip."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from imvoxelnet_tpu.ops import backproject as bp


def test_view_sharded_backproject_matches():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ('view',))

    rng = np.random.RandomState(0)
    v, hf, wf, c = 16, 12, 16, 8    # 16 views -> 2 per device
    features = rng.randn(v, hf, wf, c).astype(np.float32)
    projections = []
    for i in range(v):
        k = np.array([[20.0, 0, wf / 2], [0, 20.0, hf / 2], [0, 0, 1]],
                     np.float32)
        e = np.eye(4, dtype=np.float32)[:3]
        e[0, 3] = 0.1 * i
        projections.append(k @ e)
    projections = np.stack(projections)
    points = np.asarray(bp.get_points(
        (6, 6, 4), (0.3, 0.3, 0.3), jnp.asarray([0.0, 0.0, 2.0]))
    ).reshape(-1, 3)
    valid_hw = jnp.asarray([hf, wf], jnp.int32)

    ref_vol, ref_seen = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections),
        valid_hw)

    sharded = shard_map(
        functools.partial(bp.backproject_view_sharded, axis_name='view'),
        mesh=mesh,
        in_specs=(P('view'), P(), P('view'), P()),
        out_specs=(P(), P()),
    )
    vol, seen = jax.jit(sharded)(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections),
        valid_hw)

    np.testing.assert_array_equal(np.asarray(seen), np.asarray(ref_seen))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               atol=1e-5)
    assert np.asarray(seen).sum() > 0


def test_view_sharded_detector_end_to_end():
    """The VIEW-sharded detector (backbone+FPN+gather per shard, psum,
    replicated neck+head — ``view_shard_axis`` + ``view_sharded_forward``)
    must match the unsharded detector up to reduction-order noise (the
    psum over per-shard partial sums reorders the multi-view mean vs the
    unsharded accumulation, so last-ulp drift on O(1) activations is
    expected — hence rtol below, not exact equality).  ScanNet-style
    multi-view: 16 views over 8 devices = 2 views/device."""
    import dataclasses

    from imvoxelnet_tpu.models.detector import ImVoxelNet
    from imvoxelnet_tpu.parallel import mesh as mesh_lib
    from test_models import _make_batch, _tiny_indoor_cfg

    assert len(jax.devices()) == 8
    v = 16
    cfg = _tiny_indoor_cfg(dataset='scannet', fast=True)
    batch = dict(_make_batch(b=1, v=v, h=32, w=32))
    for k in ('gt_boxes', 'gt_labels', 'gt_mask'):
        batch.pop(k)
    # distinct per-view extrinsics so shards genuinely differ
    rng = np.random.RandomState(3)
    ext = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
    for i in range(v):
        t = i * 2 * np.pi / v
        ext[0, i, :3, :3] = np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0],
             [0, 0, 1]], np.float32)
        ext[0, i, :3, 3] = 0.05 * rng.randn(3)
    batch['extrinsics'] = jnp.asarray(ext)

    model_ref = ImVoxelNet(cfg)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, train=False)
    ref_outs, ref_valid, _ = model_ref.apply(variables, batch, train=False)

    model_sh = ImVoxelNet(dataclasses.replace(cfg, view_shard_axis='view'))
    mesh = mesh_lib.make_mesh(axis_name='view')
    fwd = mesh_lib.view_sharded_forward(model_sh, mesh)
    sh_outs, sh_valid, _ = fwd(variables, batch)

    np.testing.assert_array_equal(np.asarray(sh_valid), np.asarray(ref_valid))
    assert np.asarray(ref_valid).sum() > 0
    for lvl, (a, b) in enumerate(zip(
            jax.tree_util.tree_leaves(ref_outs),
            jax.tree_util.tree_leaves(sh_outs))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5, err_msg=f'level {lvl}')
