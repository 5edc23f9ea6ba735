import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imvoxelnet_tpu.models.detector import (
    ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_loss,
    imvoxelnet_predict)
from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig
from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig
from imvoxelnet_tpu.models.heads.layout_head import LayoutHeadConfig


def _make_batch(b=1, v=1, h=64, w=64, g=4, seed=0, with_layout=False):
    rng = np.random.RandomState(seed)
    k = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]], np.float32)
    ext = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    boxes = np.concatenate([
        rng.uniform(-2, 2, (b, g, 2)),          # x, y
        rng.uniform(2, 4, (b, g, 1)),           # z (in front of camera-ish)
        rng.uniform(0.5, 1.5, (b, g, 3)),       # sizes
        rng.uniform(-1, 1, (b, g, 1)),          # yaw
    ], axis=-1).astype(np.float32)
    batch = dict(
        images=jnp.asarray(rng.randn(b, v, h, w, 3).astype(np.float32)),
        intrinsics=jnp.tile(jnp.asarray(k), (b, 1, 1)),
        extrinsics=jnp.asarray(ext),
        origins=jnp.tile(jnp.asarray([0.0, 0.0, 3.0]), (b, 1)),
        img_shape=jnp.tile(jnp.asarray([h, w], jnp.int32), (b, 1)),
        ratios=jnp.ones((b,), jnp.float32),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_mask=jnp.asarray(rng.rand(b, g) > 0.3),
    )
    if with_layout:
        batch['gt_angles'] = jnp.zeros((b, 2), jnp.float32)
        batch['gt_layout'] = jnp.asarray(
            [[0, 0, 0, 4, 4, 3, 0.1]] * b, jnp.float32)
    return batch


def _tiny_kitti_cfg():
    head = Anchor3DHeadConfig(
        num_classes=1,
        anchor_ranges=((-3, -3, -1.0, 3, 3, -1.0),),
        nms_pre=64, max_out=8)
    return ImVoxelNetConfig(
        n_voxels=(16, 20, 12), voxel_size=(0.3, 0.3, 0.3),
        fpn_out_channels=16,
        neck=NeckConfig(kind='kitti', in_channels=16, out_channels=32),
        head_kind='anchor3d', anchor_head=head)


def _tiny_indoor_cfg(dataset='sunrgbd', version=1, fast=False, topk=-1,
                     layout=False):
    if fast:
        neck = NeckConfig(kind='fast', in_channels=16, out_channels=16,
                          n_blocks=(1, 1, 1))
    else:
        neck = NeckConfig(kind='imvoxel', channels=(16, 24, 32, 48),
                          out_channels=16, down_layers=(1, 1, 1, 1),
                          up_layers=(1, 1, 1))
    head = IndoorHeadConfig(
        n_classes=3, n_reg_outs=7 if dataset == 'sunrgbd' else 6,
        voxel_size=(0.4, 0.4, 0.4), dataset=dataset, version=version,
        centerness_topk=topk, limit=8, nms_pre=64, score_thr=0.01,
        iou_thr=0.15, max_out=16, pre_nms_k=32)
    return ImVoxelNetConfig(
        n_voxels=(16, 16, 8), voxel_size=(0.4, 0.4, 0.4),
        fpn_out_channels=16, neck=neck, head_kind='indoor',
        anchor_head=None, indoor_head=head,
        layout_head=LayoutHeadConfig(linear_size=32) if layout else None)


def _init_and_run(cfg, batch, train=True, **kwargs):
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if train:
        outs, _ = model.apply(
            variables, batch, train=True, mutable=['batch_stats'], **kwargs)
    else:
        outs = model.apply(variables, batch, train=False, **kwargs)
    return model, variables, outs


def test_kitti_model_forward_loss_predict():
    cfg = _tiny_kitti_cfg()
    batch = _make_batch(b=2)
    model, variables, outs = _init_and_run(cfg, batch)
    head_outs, valid, f2d = outs
    assert valid.shape == (2, 16, 20, 12)
    # BEV map: (ny-2, nx-2) after the padding-0 final conv
    assert head_outs[0].shape[1:3] == (18, 14)

    losses = imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)
    for k, val in losses.items():
        assert np.isfinite(float(val)), k

    preds = imvoxelnet_predict(cfg, head_outs, valid, f2d, batch)
    assert preds['boxes'].shape == (2, 8, 7)
    assert preds['scores'].shape == (2, 8)


def test_kitti_gradients_flow():
    cfg = _tiny_kitti_cfg()
    batch = _make_batch(b=1)
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        outs, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'])
        losses = imvoxelnet_loss(cfg, *outs, batch)
        return sum(losses.values())

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


@pytest.mark.parametrize('dataset,version,fast,topk', [
    ('sunrgbd', 1, False, -1),
    ('sunrgbd', 1, False, 8),      # _top27 analog
    ('sunrgbd', 2, True, 4),       # _fast analog
    ('scannet', 1, False, -1),
    ('scannet', 2, True, 4),
])
def test_indoor_model_forward_loss_predict(dataset, version, fast, topk):
    cfg = _tiny_indoor_cfg(dataset, version, fast, topk)
    batch = _make_batch(b=1, h=64, w=64)
    model, variables, outs = _init_and_run(cfg, batch)
    head_outs, valid, f2d = outs
    assert len(head_outs[0]) == 3  # 3 scales

    losses = imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)
    for k, val in losses.items():
        assert np.isfinite(float(val)), k

    preds = imvoxelnet_predict(cfg, head_outs, valid, f2d, batch)
    assert preds['boxes'].shape == (1, 16, 7)


def test_total3d_layout_head():
    cfg = _tiny_indoor_cfg('sunrgbd', 1, False, -1, layout=True)
    batch = _make_batch(b=1, with_layout=True)
    model, variables, outs = _init_and_run(cfg, batch)
    head_outs, valid, f2d = outs
    assert f2d is not None
    angles, layout = f2d
    assert angles.shape == (1, 2) and layout.shape == (1, 7)

    losses = imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)
    assert 'angle_loss' in losses and 'layout_loss' in losses
    for k, val in losses.items():
        assert np.isfinite(float(val)), k

    # predicted-extrinsics test path compiles and runs
    model2 = ImVoxelNet(cfg)
    outs2 = model2.apply(variables, batch, train=False,
                         use_predicted_extrinsics=True)
    assert outs2[0] is not None


def test_predicted_extrinsics_properties():
    """get_extrinsics port (imvoxelnet.py:163-187): output must be a valid
    rotation embedded in a 4x4, reducing to the fixed axis map at 0 angles."""
    import jax.numpy as jnp
    from imvoxelnet_tpu.models.heads.layout_head import predicted_extrinsics

    ext = np.asarray(predicted_extrinsics(jnp.asarray([[0.0, 0.0]])))[0]
    r = ext[:3, :3]
    # orthonormal rotation
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
    assert ext[3, 3] == 1.0 and np.allclose(ext[:3, 3], 0)
    # zero pitch/roll: depth (x, y, z) -> camera (x, -z, y), the same frame
    # convention as SUN RGB-D's identity-Rt extrinsic
    p = r @ np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(p, [1.0, -3.0, 2.0], atol=1e-6)

    # nonzero angles stay rotations
    for angles in ([0.3, -0.2], [-0.5, 0.4]):
        ext = np.asarray(predicted_extrinsics(jnp.asarray([angles])))[0]
        r = ext[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_indoor_head_prediction_conv_init_std():
    """Init fidelity: the prediction convs must draw from normal(std=.01)
    like the reference's ``normal_init(layer, std=.01)``
    (imvoxel_head.py:66-76).  Regression guard for the round-5 fused
    centerness+reg kernel holder (``_Kernel``), which briefly shipped with
    lecun init instead."""
    import jax
    import jax.numpy as jnp
    from imvoxelnet_tpu.models.heads.imvoxel_heads import (IndoorHead,
                                                           IndoorHeadConfig)

    cfg = IndoorHeadConfig(n_classes=10, n_reg_outs=7,
                           voxel_size=(0.16, 0.16, 0.2), dataset='sunrgbd',
                           version=1, centerness_topk=28)
    head = IndoorHead(cfg)
    xs = [jnp.zeros((1, 8, 8, 4, 64)) for _ in range(3)]
    variables = head.init(jax.random.PRNGKey(0), xs, train=False)
    params = variables['params']
    for name in ('centerness_conv', 'reg_conv', 'cls_conv'):
        k = np.asarray(params[name]['kernel'])
        # sample std of >=1.7k draws from N(0, .01): well within 15%
        assert abs(float(k.std()) - 0.01) < 0.0015, (name, float(k.std()))
    # focal-prior bias on cls only (bias_init_with_prob(.01))
    b = float(np.asarray(params['cls_conv']['bias'])[0])
    np.testing.assert_allclose(b, -np.log((1 - 0.01) / 0.01), rtol=1e-5)
