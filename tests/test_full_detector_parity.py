"""FULL-detector torch-replica conversion parity (VERDICT round-1 item 3).

Composes the reference's complete module graph — backbone -> FPN ->
backprojection -> 3D neck -> head — in torch with the reference's exact
structure and state_dict naming (``mmdet3d/models/detectors/imvoxelnet.py:45-106``),
converts the whole state_dict with ``utils/checkpoint.py``, and requires the
JAX ``ImVoxelNet`` to reproduce the end-to-end head outputs.  Also pins a
key-manifest: the converter must consume 100% of the keys a real mmdet
checkpoint contains (guarding against silent naming drift that per-module
tests cannot catch).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
from torch import nn as tnn  # noqa: E402

from imvoxelnet_tpu.models.detector import (  # noqa: E402
    ImVoxelNet, ImVoxelNetConfig, NeckConfig)
from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig  # noqa: E402
from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig  # noqa: E402
from imvoxelnet_tpu.utils import checkpoint as ckpt  # noqa: E402

from test_torch_parity import (  # noqa: E402
    TorchResNet50, TorchFPN, TorchKittiNeck, TorchFastNeck, _randomize_bn)


# ---------------------------------------------------------------------------
# torch replicas of the remaining reference pieces
# ---------------------------------------------------------------------------

class TorchAnchorHead(tnn.Module):
    """Anchor3DHead conv layers (``anchor3d_head.py:122-130``)."""

    def __init__(self, cin, num_anchors, num_classes):
        super().__init__()
        self.conv_cls = tnn.Conv2d(cin, num_anchors * num_classes, 1)
        self.conv_reg = tnn.Conv2d(cin, num_anchors * 7, 1)
        self.conv_dir_cls = tnn.Conv2d(cin, num_anchors * 2, 1)

    def forward(self, x):
        return self.conv_cls(x), self.conv_reg(x), self.conv_dir_cls(x)


class TorchScale(tnn.Module):
    def __init__(self):
        super().__init__()
        self.scale = tnn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return x * self.scale


class TorchIndoorHeadV2(tnn.Module):
    """SunRgbdImVoxelHeadV2 layers + forward (``imvoxel_head_v2.py:45-49,
    303-313``): single 3x3x3 convs, exp(scale(.)) on the six distances."""

    def __init__(self, cin, n_classes, n_reg_outs, n_scales):
        super().__init__()
        self.centerness_conv = tnn.Conv3d(cin, 1, 3, padding=1, bias=False)
        self.reg_conv = tnn.Conv3d(cin, n_reg_outs, 3, padding=1, bias=False)
        self.cls_conv = tnn.Conv3d(cin, n_classes, 3, padding=1)
        self.scales = tnn.ModuleList([TorchScale() for _ in range(n_scales)])

    def forward(self, xs):
        outs = []
        for x, scale in zip(xs, self.scales):
            reg_final = self.reg_conv(x)
            reg_distance = torch.exp(scale(reg_final[:, :6]))
            reg_angle = reg_final[:, 6:]
            outs.append((self.centerness_conv(x),
                         torch.cat((reg_distance, reg_angle), dim=1),
                         self.cls_conv(x)))
        return outs


def torch_get_points(n_voxels, voxel_size, origin):
    """``get_points`` (``imvoxelnet.py:132-141``)."""
    n_voxels = torch.tensor(n_voxels)
    voxel_size = torch.tensor(voxel_size)
    origin = torch.tensor(origin)
    pts = torch.stack(torch.meshgrid(
        torch.arange(n_voxels[0]), torch.arange(n_voxels[1]),
        torch.arange(n_voxels[2]), indexing='ij'))
    new_origin = origin - n_voxels / 2.0 * voxel_size
    return pts * voxel_size.view(3, 1, 1, 1) + new_origin.view(3, 1, 1, 1)


def torch_backproject(features, points, projection):
    """``backproject`` (``imvoxelnet.py:144-160``): nearest gather + mask."""
    n_images, n_channels, height, width = features.shape
    nx, ny, nz = points.shape[-3:]
    pts = points.view(1, 3, -1).expand(n_images, 3, -1)
    pts = torch.cat((pts, torch.ones_like(pts[:, :1])), dim=1)
    p2 = torch.bmm(projection, pts)
    x = (p2[:, 0] / p2[:, 2]).round().long()
    y = (p2[:, 1] / p2[:, 2]).round().long()
    z = p2[:, 2]
    valid = (x >= 0) & (y >= 0) & (x < width) & (y < height) & (z > 0)
    volume = torch.zeros((n_images, n_channels, pts.shape[-1]))
    for i in range(n_images):
        volume[i, :, valid[i]] = features[i, :, y[i, valid[i]], x[i, valid[i]]]
    return (volume.view(n_images, n_channels, nx, ny, nz),
            valid.view(n_images, 1, nx, ny, nz))


def torch_extract_volume(feat, intrinsic, extrinsics, origin, ratio,
                         n_voxels, voxel_size, img_shape):
    """Per-sample body of ``extract_feat`` (``imvoxelnet.py:58-76``)."""
    k = torch.tensor(intrinsic).clone()
    k[:2] /= ratio
    projection = torch.stack(
        [k @ torch.tensor(e)[:3] for e in extrinsics])
    points = torch_get_points(n_voxels, voxel_size, origin)
    h, w = img_shape[0] // 4, img_shape[1] // 4
    volume, valid = torch_backproject(feat[:, :, :h, :w], points, projection)
    volume = volume.sum(dim=0)
    valid = valid.sum(dim=0)
    volume = volume / valid
    valid = valid > 0
    volume[:, ~valid[0]] = 0.0
    return volume, valid


# ---------------------------------------------------------------------------
# shared geometry: one synthetic "scene"
# ---------------------------------------------------------------------------

H, W = 64, 160
N_VOXELS = (20, 24, 12)
VOXEL_SIZE = (0.3, 0.3, 0.3)
# Grid ~5 m in front of an identity-extrinsic camera.  The off-round origin
# is load-bearing: the gather's nearest-pixel ``round()`` is a knife-edge,
# and at (0, 0, 5.0) several voxels project EXACTLY onto x.5 pixel
# boundaries, where XLA's fused arithmetic (jit) and eager/torch legally
# round to different pixels — gathering entirely different features.  This
# origin keeps every projected coordinate >= 8e-4 away from a .5 boundary
# for all three grids used below (>> f32 reassociation noise, ~1e-5);
# ``test_projection_rounding_margin`` pins that invariant.
ORIGIN = (0.0137, -0.0213, 5.0071)
# reference ratio semantics: ori_h / (img_h / stride) (imvoxelnet.py:118) = 4
# with ori == img.  K is in full-image pixels; the stride-4 feature map is
# 40x16, so ratio=4 puts the grid's projection INSIDE it (ratio=1 projected
# every voxel out of bounds and silently zeroed the volume — the gather must
# move real features through the graph for these parity tests to bite).
RATIO = 4.0
K = np.array([[60.0, 0, 80.0], [0, 60.0, 32.0], [0, 0, 1]], np.float32)


def _jax_batch():
    rng = np.random.RandomState(7)
    img = rng.randn(1, 1, H, W, 3).astype(np.float32)
    return img, dict(
        images=jnp.asarray(img),
        intrinsics=jnp.asarray(K)[None],
        extrinsics=jnp.asarray(np.eye(4, dtype=np.float32))[None, None],
        origins=jnp.asarray(np.asarray(ORIGIN, np.float32))[None],
        img_shape=jnp.asarray(np.asarray([H, W], np.int32))[None],
        ratios=jnp.full((1,), RATIO, jnp.float32),
    )


def _expected_backbone_fpn_keys():
    def bn(p):
        return [f'{p}.{s}' for s in ('weight', 'bias', 'running_mean',
                                     'running_var', 'num_batches_tracked')]
    keys = ['backbone.conv1.weight'] + bn('backbone.bn1')
    for stage, n in enumerate((3, 4, 6, 3), start=1):
        for b in range(n):
            p = f'backbone.layer{stage}.{b}'
            for i in (1, 2, 3):
                keys += [f'{p}.conv{i}.weight'] + bn(f'{p}.bn{i}')
            if b == 0:
                keys += [f'{p}.downsample.0.weight'] + bn(f'{p}.downsample.1')
    for i in range(4):
        for mod in ('lateral_convs', 'fpn_convs'):
            keys += [f'neck.{mod}.{i}.conv.weight',
                     f'neck.{mod}.{i}.conv.bias']
    return keys, bn


def expected_kitti_state_dict_keys():
    """The complete key list of the released ``imvoxelnet_kitti`` checkpoint,
    derived from the mmdet/mmdet3d module definitions (ResNet+FPN naming,
    ``necks/imvoxelnet.py:94-123`` Sequential layout,
    ``anchor3d_head.py:122-130``)."""
    keys, bn = _expected_backbone_fpn_keys()
    for m in (0, 2, 4):   # BasicBlock3d positions
        p = f'neck_3d.model.{m}'
        keys += ([f'{p}.conv1.weight'] + bn(f'{p}.bn1')
                 + [f'{p}.conv2.weight'] + bn(f'{p}.bn2'))
    for m in (1, 3, 5):   # Sequential(conv, bn, relu) positions
        p = f'neck_3d.model.{m}'
        keys += [f'{p}.0.weight', f'{p}.0.bias'] + bn(f'{p}.1')
    for h in ('conv_cls', 'conv_reg', 'conv_dir_cls'):
        keys += [f'bbox_head.{h}.weight', f'bbox_head.{h}.bias']
    return keys


def test_full_kitti_detector_conversion_parity():
    fpn_out, neck_out, num_anchors = 16, 32, 2
    rng = np.random.RandomState(11)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchKittiNeck(cin=fpn_out, cout=neck_out).eval()
    head = TorchAnchorHead(neck_out, num_anchors, 1).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    # the manifest: replica naming == real mmdet naming, converter consumes all
    assert set(sd) == set(expected_kitti_state_dict_keys())

    cfg = ImVoxelNetConfig(
        n_voxels=N_VOXELS, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='kitti', in_channels=fpn_out,
                        out_channels=neck_out),
        head_kind='anchor3d',
        anchor_head=Anchor3DHeadConfig(
            num_classes=1,
            anchor_ranges=((-3.0, -3.3, 4.0, 3.0, 3.3, 4.0),)))
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)
    (cls_score, bbox_pred, dir_pred), valid, _ = model.apply(
        variables, batch, train=False)

    # --- torch forward: the reference's complete extract_feat -> head graph
    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))   # (V, 3, H, W)
        feat = neck(backbone(t_img))[0]                       # stride-4 map
        volume, t_valid = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            N_VOXELS, VOXEL_SIZE, (H, W))
        bev = neck_3d(volume[None])                           # (1, C, ny, nx)
        t_cls, t_reg, t_dir = head(bev)

    np.testing.assert_array_equal(np.asarray(valid[0]), t_valid[0].numpy())
    for j, t in ((cls_score, t_cls), (bbox_pred, t_reg), (dir_pred, t_dir)):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
            rtol=2e-3, atol=2e-3)


def test_full_indoor_fast_detector_conversion_parity():
    """sunrgbd `_fast` graph: FPN -> FastIndoorImVoxelNeck -> HeadV2."""
    fpn_out, n_classes = 8, 3
    rng = np.random.RandomState(12)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchFastNeck(cin=fpn_out, out=fpn_out).eval()
    head = TorchIndoorHeadV2(fpn_out, n_classes, 7, 3).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    n_voxels = (8, 8, 4)
    cfg = ImVoxelNetConfig(
        n_voxels=n_voxels, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='fast', in_channels=fpn_out,
                        out_channels=fpn_out, n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None,
        indoor_head=IndoorHeadConfig(
            n_classes=n_classes, n_reg_outs=7, voxel_size=VOXEL_SIZE,
            dataset='sunrgbd', version=2, centerness_topk=18))
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)
    (centernesses, bbox_preds, cls_scores), valid, _ = model.apply(
        variables, batch, train=False)

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, _ = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            n_voxels, VOXEL_SIZE, (H, W))
        scales_out = neck_3d(volume[None])
        t_outs = head(scales_out)

    assert len(centernesses) == len(t_outs) == 3
    for lvl, (t_cent, t_reg, t_cls) in enumerate(t_outs):
        for j, t in ((centernesses[lvl], t_cent),
                     (bbox_preds[lvl], t_reg), (cls_scores[lvl], t_cls)):
            np.testing.assert_allclose(
                np.asarray(j), t.numpy().transpose(0, 2, 3, 4, 1),
                rtol=2e-3, atol=2e-3)


def test_full_indoor_v1_detector_conversion_parity():
    """Indoor v1 graph (`imvoxelnet_sunrgbd`): FPN -> ImVoxelNeck (Atlas
    encoder-decoder, 4 down stages, trilinear decoder) -> v1 head (n_convs=0,
    so the conv set matches the V2 replica: centerness/reg/cls + per-scale
    Scale — reference ``imvoxel_head.py:46-63`` with empty towers)."""
    from test_torch_parity import TorchImVoxelNeck

    fpn_out, n_classes = 8, 2
    channels = (8, 12, 16, 24)
    rng = np.random.RandomState(13)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchImVoxelNeck(channels=channels, out=fpn_out).eval()
    head = TorchIndoorHeadV2(fpn_out, n_classes, 7, 3).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    n_voxels = (16, 16, 8)    # must survive three stride-2 stages
    cfg = ImVoxelNetConfig(
        n_voxels=n_voxels, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='imvoxel', channels=channels,
                        out_channels=fpn_out, down_layers=(1, 1, 1, 1),
                        up_layers=(1, 1, 1)),
        head_kind='indoor', anchor_head=None,
        indoor_head=IndoorHeadConfig(
            n_classes=n_classes, n_reg_outs=7, voxel_size=VOXEL_SIZE,
            dataset='sunrgbd', version=1, n_convs=0))
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)
    (centernesses, bbox_preds, cls_scores), valid, _ = model.apply(
        variables, batch, train=False)

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, t_valid = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            n_voxels, VOXEL_SIZE, (H, W))
        scales_out = neck_3d(volume[None])
        t_outs = head(scales_out)
        # the reference's per-level valid-mask resize (imvoxel_head.py:112-114)
        t_valids = [
            tnn.functional.interpolate(
                t_valid[None].float(), size=s.shape[2:],
                mode='trilinear', align_corners=False).round().bool()[0, 0]
            for s, _ in ((scales_out[i], None) for i in range(3))]

    from imvoxelnet_tpu.models.heads.imvoxel_heads import (
        resize_valid_to_levels)
    j_valids = resize_valid_to_levels(
        valid, [tuple(c.shape[1:4]) for c in centernesses])

    assert len(centernesses) == len(t_outs) == 3
    for lvl, (t_cent, t_reg, t_cls) in enumerate(t_outs):
        np.testing.assert_array_equal(
            np.asarray(j_valids[lvl][0]), t_valids[lvl].numpy())
        for j, t in ((centernesses[lvl], t_cent),
                     (bbox_preds[lvl], t_reg), (cls_scores[lvl], t_cls)):
            np.testing.assert_allclose(
                np.asarray(j), t.numpy().transpose(0, 2, 3, 4, 1),
                rtol=2e-3, atol=2e-3)


def test_projection_rounding_margin():
    """The fixture geometry must keep every voxel's projected pixel
    coordinate away from the round-to-nearest .5 boundary: at a tie, jit
    (fused arithmetic) and eager/torch legally gather different pixels and
    every full-graph comparison in this file becomes flaky.  float64 margin
    >= 5e-4 guarantees f32-computed coordinates (error ~1e-5) round
    identically everywhere."""
    k = K.astype(np.float64)
    for n_voxels in ((20, 24, 12), (8, 8, 4), (16, 16, 8)):
        n = np.asarray(n_voxels, np.float64)
        o = np.asarray(ORIGIN, np.float64)
        vs = np.asarray(VOXEL_SIZE, np.float64)
        idx = np.stack(np.meshgrid(*[np.arange(c) for c in n_voxels],
                                   indexing='ij'), -1).reshape(-1, 3)
        pts = idx * vs + (o - n / 2.0 * vs)
        u = (k[0, 0] * pts[:, 0] / pts[:, 2] + k[0, 2]) / RATIO
        v = (k[1, 1] * pts[:, 1] / pts[:, 2] + k[1, 2]) / RATIO
        for a in (u, v):
            margin = np.abs((a - np.floor(a)) - 0.5).min()
            assert margin > 5e-4, (n_voxels, margin)
