"""Checkpoint-converter tests: numeric layout parity vs torch, and full-tree
structural parity vs a reference-shaped state_dict."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from imvoxelnet_tpu.utils import checkpoint as ckpt  # noqa: E402


def test_conv2d_layout():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 10, 3).astype(np.float32)          # NHWC
    w = rng.randn(6, 3, 3, 3).astype(np.float32)           # OIHW
    yt = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                  padding=1).numpy().transpose(0, 2, 3, 1)
    yj = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(ckpt.conv2d(w)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_conv3d_layout():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 8, 4).astype(np.float32)        # NDHWC
    w = rng.randn(5, 4, 3, 3, 3).astype(np.float32)        # OIDHW
    yt = F.conv3d(torch.tensor(x.transpose(0, 4, 1, 2, 3)), torch.tensor(w),
                  padding=1).numpy().transpose(0, 2, 3, 4, 1)
    yj = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(ckpt.conv3d(w)), (1, 1, 1),
        [(1, 1)] * 3, dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_convtranspose3d_layout():
    import flax.linen as nn
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, 4, 6).astype(np.float32)
    w = rng.randn(6, 3, 2, 2, 2).astype(np.float32)        # torch (I, O, k...)
    yt = F.conv_transpose3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)), torch.tensor(w),
        stride=2).numpy().transpose(0, 2, 3, 4, 1)
    mod = nn.ConvTranspose(3, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                           transpose_kernel=True)
    yj = mod.apply({'params': {'kernel': jnp.asarray(ckpt.convtranspose3d(w))}},
                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_frozen_bn_matches_torch_eval():
    from imvoxelnet_tpu.models.resnet import FrozenBatchNorm
    rng = np.random.RandomState(3)
    c = 5
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    bn = torch.nn.BatchNorm2d(c).eval()
    bn.weight.data = torch.tensor(rng.randn(c).astype(np.float32))
    bn.bias.data = torch.tensor(rng.randn(c).astype(np.float32))
    bn.running_mean = torch.tensor(rng.randn(c).astype(np.float32))
    bn.running_var = torch.tensor(rng.rand(c).astype(np.float32) + 0.5)
    with torch.no_grad():
        yt = bn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    sd = {'b.weight': bn.weight.detach().numpy(),
          'b.bias': bn.bias.detach().numpy(),
          'b.running_mean': bn.running_mean.numpy(),
          'b.running_var': bn.running_var.numpy()}
    params = ckpt.frozen_bn(sd, 'b')
    yj = FrozenBatchNorm().apply({'params': params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_trilinear_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 4, 5, 2).astype(np.float32)
    yt = F.interpolate(torch.tensor(x.transpose(0, 4, 1, 2, 3)),
                       scale_factor=2, mode='trilinear',
                       align_corners=False).numpy().transpose(0, 2, 3, 4, 1)
    from imvoxelnet_tpu.models.necks3d import _trilinear_up2
    yj = _trilinear_up2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_fpn_nearest_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 5, 7, 2).astype(np.float32)
    yt = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=(10, 14),
                       mode='nearest').numpy().transpose(0, 2, 3, 1)
    from imvoxelnet_tpu.models.fpn import _upsample_nearest_2x
    yj = _upsample_nearest_2x(jnp.asarray(x), (10, 14))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-6)


# ---------------------------------------------------------------------------
# Full-tree structural parity for the KITTI model
# ---------------------------------------------------------------------------

def _resnet50_state_dict(rng, prefix='backbone.', scale=1.0):
    """``scale`` tames the per-conv gain (~sqrt(fan_in) for unit-normal
    weights): ~49 convs deep, unscaled activations overflow f32 to inf and
    then NaN through the next mixed-sign conv — needed by tests that assert
    on downstream *values* rather than shapes."""
    sd = {}
    sd[f'{prefix}conv1.weight'] = (
        scale * rng.randn(64, 3, 7, 7)).astype(np.float32)
    for part in ('weight', 'bias', 'running_mean', 'running_var'):
        sd[f'{prefix}bn1.{part}'] = rng.rand(64).astype(np.float32) + 0.5
    stage_blocks = (3, 4, 6, 3)
    inplanes = 64
    for stage, n in enumerate(stage_blocks, start=1):
        planes = 64 * 2 ** (stage - 1)
        for b in range(n):
            p = f'{prefix}layer{stage}.{b}'
            cin = inplanes if b == 0 else planes * 4
            sd[f'{p}.conv1.weight'] = (
                scale * rng.randn(planes, cin, 1, 1)).astype(np.float32)
            sd[f'{p}.conv2.weight'] = (
                scale * rng.randn(planes, planes, 3, 3)).astype(np.float32)
            sd[f'{p}.conv3.weight'] = (
                scale * rng.randn(planes * 4, planes, 1, 1)).astype(np.float32)
            for i, c in ((1, planes), (2, planes), (3, planes * 4)):
                for part in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{p}.bn{i}.{part}'] = rng.rand(c).astype(np.float32) + 0.5
            if b == 0:
                sd[f'{p}.downsample.0.weight'] = (scale * rng.randn(
                    planes * 4, cin, 1, 1)).astype(np.float32)
                for part in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{p}.downsample.1.{part}'] = rng.rand(
                        planes * 4).astype(np.float32) + 0.5
        inplanes = planes * 4
    return sd


def _fpn_state_dict(rng, out_c=16):
    sd = {}
    for i, cin in enumerate((256, 512, 1024, 2048)):
        sd[f'neck.lateral_convs.{i}.conv.weight'] = rng.randn(
            out_c, cin, 1, 1).astype(np.float32)
        sd[f'neck.lateral_convs.{i}.conv.bias'] = rng.randn(out_c).astype(np.float32)
        sd[f'neck.fpn_convs.{i}.conv.weight'] = rng.randn(
            out_c, out_c, 3, 3).astype(np.float32)
        sd[f'neck.fpn_convs.{i}.conv.bias'] = rng.randn(out_c).astype(np.float32)
    return sd


def _bn3d_sd(rng, sd, prefix, c):
    for part in ('weight', 'bias', 'running_mean', 'running_var'):
        sd[f'{prefix}.{part}'] = rng.rand(c).astype(np.float32) + 0.5


def _basicblock3d_sd(rng, sd, prefix, c):
    sd[f'{prefix}.conv1.weight'] = rng.randn(c, c, 3, 3, 3).astype(np.float32)
    sd[f'{prefix}.conv2.weight'] = rng.randn(c, c, 3, 3, 3).astype(np.float32)
    _bn3d_sd(rng, sd, f'{prefix}.bn1', c)
    _bn3d_sd(rng, sd, f'{prefix}.bn2', c)


def _kitti_neck_sd(rng, c=16, out=32):
    sd = {}
    _basicblock3d_sd(rng, sd, 'neck_3d.model.0', c)
    sd['neck_3d.model.1.0.weight'] = rng.randn(c * 2, c, 3, 3, 3).astype(np.float32)
    sd['neck_3d.model.1.0.bias'] = rng.randn(c * 2).astype(np.float32)
    _bn3d_sd(rng, sd, 'neck_3d.model.1.1', c * 2)
    _basicblock3d_sd(rng, sd, 'neck_3d.model.2', c * 2)
    sd['neck_3d.model.3.0.weight'] = rng.randn(c * 4, c * 2, 3, 3, 3).astype(np.float32)
    sd['neck_3d.model.3.0.bias'] = rng.randn(c * 4).astype(np.float32)
    _bn3d_sd(rng, sd, 'neck_3d.model.3.1', c * 4)
    _basicblock3d_sd(rng, sd, 'neck_3d.model.4', c * 4)
    sd['neck_3d.model.5.0.weight'] = rng.randn(out, c * 4, 3, 3, 3).astype(np.float32)
    sd['neck_3d.model.5.0.bias'] = rng.randn(out).astype(np.float32)
    _bn3d_sd(rng, sd, 'neck_3d.model.5.1', out)
    return sd


def _anchor_head_sd(rng, c=32, na=2, nc=1, code=7):
    return {
        'bbox_head.conv_cls.weight': rng.randn(na * nc, c, 1, 1).astype(np.float32),
        'bbox_head.conv_cls.bias': rng.randn(na * nc).astype(np.float32),
        'bbox_head.conv_reg.weight': rng.randn(na * code, c, 1, 1).astype(np.float32),
        'bbox_head.conv_reg.bias': rng.randn(na * code).astype(np.float32),
        'bbox_head.conv_dir_cls.weight': rng.randn(na * 2, c, 1, 1).astype(np.float32),
        'bbox_head.conv_dir_cls.bias': rng.randn(na * 2).astype(np.float32),
    }


def test_full_kitti_conversion_tree_matches_model():
    from test_models import _make_batch, _tiny_kitti_cfg
    from imvoxelnet_tpu.models.detector import ImVoxelNet

    rng = np.random.RandomState(0)
    sd = {}
    sd.update(_resnet50_state_dict(rng))
    sd.update(_fpn_state_dict(rng, out_c=16))
    sd.update(_kitti_neck_sd(rng, c=16, out=32))
    sd.update(_anchor_head_sd(rng, c=32))

    cfg = _tiny_kitti_cfg()
    converted = ckpt.convert_reference_checkpoint(sd, cfg)

    model = ImVoxelNet(cfg)
    batch = _make_batch(b=1)
    init_vars = model.init(jax.random.PRNGKey(0), batch, train=False)

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(v) for p, v in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    init_p = paths(init_vars['params'])
    conv_p = paths(converted['params'])
    assert set(init_p) == set(conv_p), (
        sorted(set(init_p) - set(conv_p))[:10],
        sorted(set(conv_p) - set(init_p))[:10])
    for k in init_p:
        assert init_p[k] == conv_p[k], (k, init_p[k], conv_p[k])

    init_s = paths(init_vars['batch_stats'])
    conv_s = paths(converted['batch_stats'])
    assert set(init_s) == set(conv_s), (
        sorted(set(init_s) - set(conv_s))[:10],
        sorted(set(conv_s) - set(init_s))[:10])

    # converted variables actually run
    outs = model.apply(converted, batch, train=False)
    assert outs[0][0].shape[-1] == 2  # cls channels = anchors * classes


# ---------------------------------------------------------------------------
# Round-3: the two remaining graph families (Total3D, nuScenes-DCN) get the
# same 100%-key manifest treatment (VERDICT r2 item 6), with strict=True so
# every reference state_dict key must be consumed by the converter.
# ---------------------------------------------------------------------------

def _paths(tree):
    return {jax.tree_util.keystr(p): np.shape(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _assert_manifest_match(init_vars, converted):
    for coll in ('params', 'batch_stats'):
        init_p = _paths(init_vars.get(coll, {}))
        conv_p = _paths(converted.get(coll, {}))
        assert set(init_p) == set(conv_p), (
            coll,
            sorted(set(init_p) - set(conv_p))[:10],
            sorted(set(conv_p) - set(init_p))[:10])
        for k in init_p:
            assert init_p[k] == conv_p[k], (coll, k, init_p[k], conv_p[k])


def _indoor_head_sd(rng, c=16, n_classes=3, n_reg=7, n_scales=3):
    sd = {
        'bbox_head.centerness_conv.weight':
            rng.randn(1, c, 3, 3, 3).astype(np.float32),
        'bbox_head.reg_conv.weight':
            rng.randn(n_reg, c, 3, 3, 3).astype(np.float32),
        'bbox_head.cls_conv.weight':
            rng.randn(n_classes, c, 3, 3, 3).astype(np.float32),
        'bbox_head.cls_conv.bias': rng.randn(n_classes).astype(np.float32),
    }
    for i in range(n_scales):
        sd[f'bbox_head.scales.{i}.scale'] = np.float32(1.0 + 0.1 * i)
    return sd


def _layout_head_sd(rng, cin=2048, hidden=32):
    sd = {}
    for mlp, out in (('angle_mlp', 2), ('layout_mlp', 7)):
        dims = ((cin, hidden), (hidden, hidden), (hidden, out))
        for pos, (i, o) in zip((0, 3, 6), dims):
            sd[f'head_2d.{mlp}.{pos}.weight'] = rng.randn(
                o, i).astype(np.float32) * 0.05
            sd[f'head_2d.{mlp}.{pos}.bias'] = rng.randn(o).astype(np.float32)
    return sd


def test_full_total3d_conversion_tree_matches_model():
    """Total3D graph family: imvoxel neck + indoor v1 head + layout head,
    strict key consumption + structural manifest + runnable graph."""
    from test_models import _make_batch, _tiny_indoor_cfg
    from test_torch_parity import TorchImVoxelNeck, _randomize_bn
    from imvoxelnet_tpu.models.detector import ImVoxelNet

    rng = np.random.RandomState(7)
    channels = (16, 24, 32, 48)
    tm = TorchImVoxelNeck(channels=channels, out=16).eval()
    _randomize_bn(tm, rng)
    sd = {f'neck_3d.{k}': v.detach().numpy()
          for k, v in tm.state_dict().items()}
    # scaled so C5 stays finite: the layout head's exp() positivity
    # assertion below needs real (non-NaN) activations end-to-end
    sd.update(_resnet50_state_dict(rng, scale=0.02))
    sd.update(_fpn_state_dict(rng, out_c=16))
    sd.update(_indoor_head_sd(rng, c=16, n_classes=3, n_reg=7))
    sd.update(_layout_head_sd(rng, cin=2048, hidden=32))

    cfg = _tiny_indoor_cfg(dataset='sunrgbd', version=1, layout=True)
    converted = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    model = ImVoxelNet(cfg)
    batch = _make_batch(b=1, with_layout=True)
    init_vars = model.init(jax.random.PRNGKey(0), batch, train=False)
    _assert_manifest_match(init_vars, converted)

    head_outs, valid, f2d = model.apply(converted, batch, train=False)
    angles, layout = f2d
    assert angles.shape == (1, 2) and layout.shape == (1, 7)
    assert np.all(np.asarray(layout)[:, 3:6] > 0)   # sizes exponentiated


def test_layout_head_conversion_numeric_parity():
    """LayoutHead numeric parity vs a live-torch replica of the reference
    module (``layout_head.py:17-73``: two Linear/ReLU/Dropout MLPs on
    globally pooled C5, limit_period on angles, exp on layout sizes)."""
    import torch.nn as tnn

    from imvoxelnet_tpu.models.heads.layout_head import (
        LayoutHead, LayoutHeadConfig)

    rng = np.random.RandomState(11)
    cin, hidden = 24, 32

    def mlp(out):
        return tnn.Sequential(
            tnn.Linear(cin, hidden), tnn.ReLU(), tnn.Dropout(0.0),
            tnn.Linear(hidden, hidden), tnn.ReLU(), tnn.Dropout(0.0),
            tnn.Linear(hidden, out))

    tm = tnn.ModuleDict(dict(angle_mlp=mlp(2), layout_mlp=mlp(7))).eval()
    sd = {f'head_2d.{k.replace(".", ".", 1)}': v.detach().numpy()
          for k, v in tm.state_dict().items()}

    x = rng.randn(3, 5, 7, cin).astype(np.float32)
    with torch.no_grad():
        pooled = torch.tensor(x).mean(dim=(1, 2))
        t_angle = tm['angle_mlp'](pooled)
        # limit_period(val, 0.5, pi) (mmdet3d core, default offset/period)
        t_angle = t_angle - torch.floor(t_angle / np.pi + 0.5) * np.pi
        t_raw = tm['layout_mlp'](pooled)
        t_layout = torch.cat(
            [t_raw[:, :3], torch.exp(t_raw[:, 3:6]), t_raw[:, 6:7]], dim=1)

    params, _ = ckpt.convert_layout_head(sd)
    j_angle, j_layout = LayoutHead(LayoutHeadConfig(linear_size=hidden)).apply(
        {'params': params}, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(j_angle), t_angle.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_layout), t_layout.numpy(),
                               rtol=1e-4, atol=1e-5)


def _resnet50_dcn_state_dict(rng, stage_with_dcn):
    """ResNet-50 state dict with mmcv DCNv2 conv2 in the flagged stages
    (``imvoxelnet_nuscenes.py:13-14``: stages 3-4): the deformable conv
    keeps its ``conv2.weight`` and gains ``conv2.conv_offset.{weight,bias}``
    (27 = 2*9 offsets + 9 masks output channels)."""
    sd = _resnet50_state_dict(rng)
    stage_blocks = (3, 4, 6, 3)
    for stage, n in enumerate(stage_blocks, start=1):
        if not stage_with_dcn[stage - 1]:
            continue
        planes = 64 * 2 ** (stage - 1)
        for b in range(n):
            p = f'backbone.layer{stage}.{b}'
            sd[f'{p}.conv2.conv_offset.weight'] = (
                0.01 * rng.randn(27, planes, 3, 3)).astype(np.float32)
            sd[f'{p}.conv2.conv_offset.bias'] = (
                0.01 * rng.randn(27)).astype(np.float32)
    return sd


def test_full_nuscenes_dcn_conversion_tree_matches_model():
    """nuScenes graph family: DCNv2 stages 3-4 + NuScenes neck + anchor head,
    strict key consumption + structural manifest + runnable graph."""
    from test_models import _make_batch
    from imvoxelnet_tpu.models.detector import (
        ImVoxelNet, ImVoxelNetConfig, NeckConfig)
    from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig

    rng = np.random.RandomState(13)
    dcn = (False, False, True, True)
    sd = _resnet50_dcn_state_dict(rng, dcn)
    sd.update(_fpn_state_dict(rng, out_c=16))
    sd.update(_kitti_neck_sd(rng, c=16, out=32))
    sd.update(_anchor_head_sd(rng, c=32))

    cfg = ImVoxelNetConfig(
        n_voxels=(16, 16, 12), voxel_size=(0.3, 0.3, 0.3),
        fpn_out_channels=16,
        neck=NeckConfig(kind='nuscenes', in_channels=16, out_channels=32),
        head_kind='anchor3d',
        anchor_head=Anchor3DHeadConfig(
            num_classes=1, anchor_ranges=((-2, -2, -1.0, 2, 2, -1.0),),
            nms_pre=64, max_out=8),
        stage_with_dcn=dcn)
    converted = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    model = ImVoxelNet(cfg)
    batch = _make_batch(b=1)
    init_vars = model.init(jax.random.PRNGKey(0), batch, train=False)
    _assert_manifest_match(init_vars, converted)

    head_outs, valid, _ = model.apply(converted, batch, train=False)
    assert head_outs[0].ndim == 4
