"""FULL-graph training-loss parity: the scalar the optimizer actually sees.

Composes the two existing replica layers end-to-end: the full torch module
graph (backbone -> FPN -> backprojection -> 3D neck -> head, with converted
weights — ``test_full_detector_parity``) run in the reference's *training*
normalization mode (backbone BN eval per ``norm_eval=True``,
``imvoxelnet_kitti.py:10-11``; 3D-neck BN in train mode = batch statistics),
feeding the torch loss-stack replicas (``test_loss_parity``).  The JAX side
is the production path verbatim: ``ImVoxelNet.apply(train=True)`` +
``imvoxelnet_loss``.

This closes the last gap between "forward outputs match" and "loss values
match on synthetic heads": here the loss is computed on *graph-produced*
head outputs with train-mode BN, so any divergence anywhere in the train
pipeline (stats mode, dtype casts, valid-mask plumbing into the loss)
would surface.
"""

import numpy as np
import jax
import pytest

torch = pytest.importorskip('torch')

from imvoxelnet_tpu.models.detector import (  # noqa: E402
    ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_loss)
from imvoxelnet_tpu.models.heads import anchor3d_head as ah  # noqa: E402
from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig  # noqa: E402
from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig  # noqa: E402
from imvoxelnet_tpu.utils import checkpoint as ckpt  # noqa: E402

from test_full_detector_parity import (  # noqa: E402
    TorchAnchorHead, TorchIndoorHeadV2, torch_extract_volume, _jax_batch,
    H, W, K, N_VOXELS, VOXEL_SIZE, ORIGIN, RATIO)
from test_torch_parity import (  # noqa: E402
    TorchResNet50, TorchFPN, TorchKittiNeck, TorchFastNeck,
    TorchNuScenesNeck, _randomize_bn, _randomize_conv_offsets)
import test_loss_parity as lp  # noqa: E402


def _with_gt(batch, gt_boxes, gt_labels, gt_mask):
    import jax.numpy as jnp
    out = dict(batch)
    out['gt_boxes'] = jnp.asarray(gt_boxes)
    out['gt_labels'] = jnp.asarray(gt_labels)
    out['gt_mask'] = jnp.asarray(gt_mask)
    return out


def test_full_kitti_train_loss_parity():
    fpn_out, neck_out, num_anchors = 16, 32, 2
    rng = np.random.RandomState(21)

    backbone = TorchResNet50().eval()     # norm_eval=True in every config
    neck = TorchFPN(out=fpn_out).eval()   # no BN
    neck_3d = TorchKittiNeck(cin=fpn_out, cout=neck_out).train()
    head = TorchAnchorHead(neck_out, num_anchors, 1).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

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

    # GT near anchors so MaxIoU yields real positives (as in
    # test_loss_parity._random_outdoor_batch)
    probe = model.apply(variables, batch, train=False)[0]
    hf, wf = probe[0].shape[1:3]
    anchors = np.asarray(ah.head_anchors((hf, wf), cfg.anchor_head))
    g = 4
    base = anchors[rng.choice(len(anchors), g, replace=False)].copy()
    base[:, :2] += 0.15 * rng.randn(g, 2)
    base[:, 3:6] *= np.exp(0.05 * rng.randn(g, 3))
    base[:, 6] += 0.1 * rng.randn(g)
    gt_boxes = base[None].astype(np.float32)
    gt_labels = np.zeros((1, g), np.int32)
    gt_mask = np.ones((1, g), bool)

    def jax_losses(variables, batch):
        outs, _ = model.apply(variables, batch, train=True,
                              mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        return imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)

    ours = jax.jit(jax_losses)(
        variables, _with_gt(batch, gt_boxes, gt_labels, gt_mask))

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, _ = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            N_VOXELS, VOXEL_SIZE, (H, W))
        bev = neck_3d(volume[None])          # train-mode BN batch stats
        t_cls, t_reg, t_dir = (t.permute(0, 2, 3, 1) for t in head(bev))

    theirs = lp.torch_anchor3d_loss(
        t_cls, t_reg, t_dir, torch.tensor(anchors),
        [torch.tensor(gt_boxes[0])],
        [torch.tensor(gt_labels[0], dtype=torch.long)], cfg.anchor_head)

    assert float(theirs['loss_bbox'].detach()) > 0     # real positives
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), rtol=5e-3, atol=1e-5,
            err_msg=k)


def test_full_kitti_param_grad_parity():
    """FULL-graph PARAMETER-gradient parity: d(total loss)/d(weights) through
    the entire KITTI graph — loss stack, head convs, the z-collapsing neck's
    train-mode BN, the backprojection gather's backward (scatter-add), FPN,
    and the frozen-BN ResNet — must match torch autograd on the replica
    stack.  This is the training signal itself: if these gradients match,
    an optimizer step moves both frameworks' weights identically."""
    fpn_out, neck_out, num_anchors = 16, 32, 2
    rng = np.random.RandomState(21)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchKittiNeck(cin=fpn_out, cout=neck_out).train()
    head = TorchAnchorHead(neck_out, num_anchors, 1).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

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

    probe = model.apply(variables, batch, train=False)[0]
    hf, wf = probe[0].shape[1:3]
    anchors = np.asarray(ah.head_anchors((hf, wf), cfg.anchor_head))
    g = 4
    base = anchors[rng.choice(len(anchors), g, replace=False)].copy()
    base[:, :2] += 0.15 * rng.randn(g, 2)
    base[:, 3:6] *= np.exp(0.05 * rng.randn(g, 3))
    base[:, 6] += 0.1 * rng.randn(g)
    gt_boxes = base[None].astype(np.float32)
    gt_labels = np.zeros((1, g), np.int32)
    gt_mask = np.ones((1, g), bool)
    batch_gt = _with_gt(batch, gt_boxes, gt_labels, gt_mask)

    def total_loss(params):
        outs, _ = model.apply({**variables, 'params': params}, batch_gt,
                              train=True, mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        losses = imvoxelnet_loss(cfg, head_outs, valid, f2d, batch_gt)
        return losses['loss_cls'] + losses['loss_bbox'] + losses['loss_dir']

    g_jax = jax.jit(jax.grad(total_loss))(variables['params'])

    # torch: same graph with autograd enabled end-to-end
    t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
    feat = neck(backbone(t_img))[0]
    volume, _ = torch_extract_volume(
        feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
        N_VOXELS, VOXEL_SIZE, (H, W))
    bev = neck_3d(volume[None])
    t_cls, t_reg, t_dir = (t.permute(0, 2, 3, 1) for t in head(bev))
    theirs = lp.torch_anchor3d_loss(
        t_cls, t_reg, t_dir, torch.tensor(anchors),
        [torch.tensor(gt_boxes[0])],
        [torch.tensor(gt_labels[0], dtype=torch.long)], cfg.anchor_head)
    total = theirs['loss_cls'] + theirs['loss_bbox'] + theirs['loss_dir']
    assert float(theirs['loss_bbox'].detach()) > 0
    total.backward()
    t_grads = {n: p.grad for n, p in
               [(f'{pre}.{n}', p) for pre, m in
                (('backbone', backbone), ('neck', neck),
                 ('neck_3d', neck_3d), ('bbox_head', head))
                for n, p in m.named_parameters()]}

    def close(jax_leaf, torch_name, transform=None, tol=2e-2):
        gt_ = t_grads[torch_name].detach().numpy()
        if transform is not None:
            gt_ = transform(gt_)
        gj = np.asarray(jax_leaf)
        assert np.abs(gt_).max() > 0, f'{torch_name}: zero torch grad'
        np.testing.assert_allclose(
            gj, gt_, rtol=tol, atol=tol * np.abs(gt_).max(),
            err_msg=torch_name)

    t2d = lambda w: w.transpose(2, 3, 1, 0)    # OIHW  -> HWIO
    t3d = lambda w: w.transpose(2, 3, 4, 1, 0)  # OIDHW -> DHWIO
    p = g_jax
    close(p['bbox_head']['conv_cls']['kernel'], 'bbox_head.conv_cls.weight', t2d)
    close(p['bbox_head']['conv_cls']['bias'], 'bbox_head.conv_cls.bias')
    close(p['bbox_head']['conv_reg']['kernel'], 'bbox_head.conv_reg.weight', t2d)
    close(p['bbox_head']['conv_dir_cls']['kernel'],
          'bbox_head.conv_dir_cls.weight', t2d)
    close(p['neck_3d']['out_conv']['conv']['kernel'],
          'neck_3d.model.5.0.weight', t3d)
    close(p['neck_3d']['block0']['conv1']['kernel'],
          'neck_3d.model.0.conv1.weight', t3d)
    close(p['neck']['lateral_0']['kernel'],
          'neck.lateral_convs.0.conv.weight', t2d)
    # fpn_convs.{1,2,3} only feed the unused P3-P5 outputs (only the
    # stride-4 level enters the volume): their grads are zero on both sides.
    # lateral_3 contributes to P2 through the top-down sum, so it checks the
    # full FPN pathway.
    assert t_grads['neck.fpn_convs.3.conv.weight'] is None or \
        float(t_grads['neck.fpn_convs.3.conv.weight'].abs().max()) == 0
    np.testing.assert_array_equal(
        np.asarray(p['neck']['fpn_3']['kernel']), 0.0)
    close(p['neck']['lateral_3']['kernel'],
          'neck.lateral_convs.3.conv.weight', t2d)
    close(p['backbone']['layer3_2']['conv2']['kernel'],
          'backbone.layer3.2.conv2.weight', t2d)
    close(p['backbone']['conv1']['kernel'], 'backbone.conv1.weight', t2d)


def test_full_nuscenes_dcn_train_loss_parity():
    """The fifth graph family end-to-end: DCNv2 ResNet-50 (stages 3-4,
    ``imvoxelnet_nuscenes.py:13-14``, nonzero offsets) -> FPN ->
    backprojection -> NuScenes neck (train-mode BN) -> Anchor3DHead at the
    nuScenes loss knobs (``imvoxelnet_nuscenes.py:24-45``: dir_offset=0.7854,
    dir_limit_offset=0, bbox weight 1.0, assigner 0.6/0.3/0.3) vs the torch
    replica stack — composed via the oracle-validated pure-torch DCNv2."""
    fpn_out, neck_out, num_anchors, n_classes = 16, 32, 2, 2
    rng = np.random.RandomState(29)
    dcn = (False, False, True, True)

    backbone = TorchResNet50(stage_with_dcn=dcn).eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchNuScenesNeck(cin=fpn_out, cout=neck_out).train()
    head = TorchAnchorHead(neck_out, num_anchors, n_classes).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)
    _randomize_conv_offsets(backbone, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    head_cfg = Anchor3DHeadConfig(
        num_classes=n_classes,
        anchor_ranges=((-3.0, -3.3, 4.0, 3.0, 3.3, 4.0),),
        anchor_sizes=((1.98, 4.67, 1.74),),
        dir_offset=0.7854, dir_limit_offset=0.0, loss_bbox_weight=1.0,
        assigner=lp.AssignerConfig(0.6, 0.3, 0.3))
    cfg = ImVoxelNetConfig(
        n_voxels=N_VOXELS, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='nuscenes', in_channels=fpn_out,
                        out_channels=neck_out),
        head_kind='anchor3d', anchor_head=head_cfg,
        stage_with_dcn=dcn)
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)

    probe = model.apply(variables, batch, train=False)[0]
    hf, wf = probe[0].shape[1:3]
    anchors = np.asarray(ah.head_anchors((hf, wf), cfg.anchor_head))
    g = 4
    base = anchors[rng.choice(len(anchors), g, replace=False)].copy()
    base[:, :2] += 0.15 * rng.randn(g, 2)
    base[:, 3:6] *= np.exp(0.05 * rng.randn(g, 3))
    base[:, 6] += 0.1 * rng.randn(g)
    gt_boxes = base[None].astype(np.float32)
    gt_labels = rng.randint(0, n_classes, (1, g)).astype(np.int32)
    gt_mask = np.ones((1, g), bool)

    def jax_losses(variables, batch):
        outs, _ = model.apply(variables, batch, train=True,
                              mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        return imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)

    ours = jax.jit(jax_losses)(
        variables, _with_gt(batch, gt_boxes, gt_labels, gt_mask))

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, _ = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            N_VOXELS, VOXEL_SIZE, (H, W))
        bev = neck_3d(volume[None])          # train-mode BN batch stats
        t_cls, t_reg, t_dir = (t.permute(0, 2, 3, 1) for t in head(bev))

    theirs = lp.torch_anchor3d_loss(
        t_cls, t_reg, t_dir, torch.tensor(anchors),
        [torch.tensor(gt_boxes[0])],
        [torch.tensor(gt_labels[0], dtype=torch.long)], cfg.anchor_head)

    assert float(theirs['loss_bbox'].detach()) > 0     # real positives
    for k in ('loss_cls', 'loss_bbox', 'loss_dir'):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), rtol=5e-3, atol=1e-5,
            err_msg=k)


def test_full_indoor_fast_train_loss_parity():
    """sunrgbd `_fast` graph in train mode -> v2 loss replica."""
    fpn_out, n_classes = 8, 3
    rng = np.random.RandomState(22)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchFastNeck(cin=fpn_out, out=fpn_out).train()
    head = TorchIndoorHeadV2(fpn_out, n_classes, 7, 3).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    n_voxels = (8, 8, 4)
    head_cfg = IndoorHeadConfig(
        n_classes=n_classes, n_reg_outs=7, voxel_size=VOXEL_SIZE,
        dataset='sunrgbd', version=2, centerness_topk=18, limit=27)
    cfg = ImVoxelNetConfig(
        n_voxels=n_voxels, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='fast', in_channels=fpn_out,
                        out_channels=fpn_out, n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None, indoor_head=head_cfg)
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)

    # GT inside the grid (extent n_voxels * voxel_size around ORIGIN);
    # a dedicated rng keeps the boxes independent of how many draws the BN
    # randomization consumed
    grng = np.random.RandomState(55)
    g = 5
    extent = np.asarray(n_voxels) * np.asarray(VOXEL_SIZE)
    c = (grng.rand(g, 3) - 0.5) * extent * 0.7 + np.asarray(ORIGIN)
    size = np.exp(grng.uniform(np.log(.4), np.log(1.6), (g, 3)))
    yaw = grng.uniform(-np.pi, np.pi, (g, 1))
    boxes = np.concatenate([c, size, yaw], 1)
    boxes[:, 2] -= boxes[:, 5] / 2
    gt_boxes = boxes[None].astype(np.float32)
    gt_labels = grng.randint(0, n_classes, (1, g)).astype(np.int32)
    gt_mask = np.ones((1, g), bool)

    def jax_losses(variables, batch):
        outs, _ = model.apply(variables, batch, train=True,
                              mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        return imvoxelnet_loss(cfg, head_outs, valid, f2d, batch), valid

    ours, valid = jax.jit(jax_losses)(
        variables, _with_gt(batch, gt_boxes, gt_labels, gt_mask))

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, t_valid = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            n_voxels, VOXEL_SIZE, (H, W))
        scales_out = neck_3d(volume[None])   # train-mode BN batch stats
        t_outs = head(scales_out)

    np.testing.assert_array_equal(np.asarray(valid[0]), t_valid[0].numpy())

    sizes = [tuple(t[0].shape[-3:]) for t in t_outs]
    scales_cat = torch.cat([
        torch.full((int(np.prod(s)),), i, dtype=torch.long)
        for i, s in enumerate(sizes)])
    pts = torch.cat(lp.torch_mlvl_points(
        sizes, VOXEL_SIZE, np.asarray(ORIGIN, np.float32)))
    vt = t_valid[:1][None].float()           # (1, 1, nx, ny, nz)
    valid_lv = [torch.nn.Upsample(size=s, mode='trilinear')(vt)
                .round().bool().reshape(-1) for s in sizes]
    center = torch.cat([t[0][0].permute(1, 2, 3, 0).reshape(-1)
                        for t in t_outs])
    bbox = torch.cat([t[1][0].permute(1, 2, 3, 0).reshape(-1, 7)
                      for t in t_outs])
    cls = torch.cat([t[2][0].permute(1, 2, 3, 0).reshape(-1, n_classes)
                     for t in t_outs])
    lc, lb, lcls = lp.torch_indoor_v2_loss_single(
        center, bbox, cls, torch.cat(valid_lv), pts, scales_cat,
        torch.tensor(gt_boxes[0]),
        torch.tensor(gt_labels[0], dtype=torch.long), head_cfg)

    assert lb > 0
    for k, t in (('loss_centerness', lc), ('loss_bbox', lb),
                 ('loss_cls', lcls)):
        np.testing.assert_allclose(
            float(ours[k]), float(t), rtol=5e-3, atol=1e-5, err_msg=k)


class TorchLayoutHead(torch.nn.Module):
    """LayoutHead replica with mmdet naming (``layout_head.py:17-73``)."""

    def __init__(self, cin, hidden):
        super().__init__()
        tnn = torch.nn

        def mlp(out):
            return tnn.Sequential(
                tnn.Linear(cin, hidden), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Linear(hidden, hidden), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Linear(hidden, out))

        self.angle_mlp = mlp(2)
        self.layout_mlp = mlp(7)

    def forward(self, c5):
        pooled = c5.mean(dim=(2, 3))
        angle = self.angle_mlp(pooled)
        angle = angle - torch.floor(angle / np.pi + 0.5) * np.pi
        raw = self.layout_mlp(pooled)
        layout = torch.cat(
            [raw[:, :3], torch.exp(raw[:, 3:6]), raw[:, 6:7]], dim=1)
        return angle, layout


def test_full_total3d_train_loss_parity():
    """Total3D graph (indoor detector + head_2d) in train mode: the full
    5-loss dict (centerness/bbox/cls + angle/layout) matches the replicas."""
    from imvoxelnet_tpu.models.heads.layout_head import LayoutHeadConfig

    fpn_out, n_classes, hidden = 8, 3, 16
    rng = np.random.RandomState(23)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchFastNeck(cin=fpn_out, out=fpn_out).train()
    head = TorchIndoorHeadV2(fpn_out, n_classes, 7, 3).eval()
    head_2d = TorchLayoutHead(2048, hidden).eval()
    for m in (backbone, neck, neck_3d, head, head_2d):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head),
                      ('head_2d', head_2d)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    n_voxels = (8, 8, 4)
    head_cfg = IndoorHeadConfig(
        n_classes=n_classes, n_reg_outs=7, voxel_size=VOXEL_SIZE,
        dataset='sunrgbd', version=2, centerness_topk=18, limit=27)
    layout_cfg = LayoutHeadConfig(linear_size=hidden)
    cfg = ImVoxelNetConfig(
        n_voxels=n_voxels, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='fast', in_channels=fpn_out,
                        out_channels=fpn_out, n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None, indoor_head=head_cfg,
        layout_head=layout_cfg)
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)

    grng = np.random.RandomState(56)
    g = 5
    extent = np.asarray(n_voxels) * np.asarray(VOXEL_SIZE)
    c = (grng.rand(g, 3) - 0.5) * extent * 0.7 + np.asarray(ORIGIN)
    size = np.exp(grng.uniform(np.log(.4), np.log(1.6), (g, 3)))
    yaw = grng.uniform(-np.pi, np.pi, (g, 1))
    boxes = np.concatenate([c, size, yaw], 1)
    boxes[:, 2] -= boxes[:, 5] / 2
    gt_boxes = boxes[None].astype(np.float32)
    gt_labels = grng.randint(0, n_classes, (1, g)).astype(np.int32)
    gt_mask = np.ones((1, g), bool)
    gt_angles = (0.3 * grng.randn(1, 2)).astype(np.float32)
    gt_layout = np.concatenate([
        0.5 * grng.randn(1, 2), np.zeros((1, 1)),
        np.exp(grng.uniform(np.log(2.0), np.log(5.0), (1, 3))),
        grng.uniform(-np.pi, np.pi, (1, 1))], axis=1).astype(np.float32)

    batch_gt = _with_gt(batch, gt_boxes, gt_labels, gt_mask)
    import jax.numpy as jnp
    batch_gt['gt_angles'] = jnp.asarray(gt_angles)
    batch_gt['gt_layout'] = jnp.asarray(gt_layout)

    def jax_losses(variables, batch):
        outs, _ = model.apply(variables, batch, train=True,
                              mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        return imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)

    ours = jax.jit(jax_losses)(variables, batch_gt)
    assert set(ours) == {'loss_centerness', 'loss_bbox', 'loss_cls',
                         'angle_loss', 'layout_loss'}

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        c5 = backbone(t_img)[-1]
        t_angles, t_layout = head_2d(c5)
    t_angle_loss, t_layout_loss = lp.torch_layout_loss(
        t_angles, t_layout, torch.tensor(gt_angles),
        torch.tensor(gt_layout),
        layout_cfg.loss_angle_weight, layout_cfg.loss_layout_weight)

    assert t_layout_loss > 0.01
    np.testing.assert_allclose(float(ours['angle_loss']), t_angle_loss,
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(float(ours['layout_loss']), t_layout_loss,
                               rtol=5e-3, atol=1e-5)


class TorchScanNetHeadV2(torch.nn.Module):
    """ScanNetImVoxelHeadV2 forward (``imvoxel_head_v2.py:442-449``):
    exp(scale(.)) on all six distances, no angle channel."""

    def __init__(self, cin, n_classes, n_scales):
        super().__init__()
        tnn = torch.nn
        self.centerness_conv = tnn.Conv3d(cin, 1, 3, padding=1, bias=False)
        self.reg_conv = tnn.Conv3d(cin, 6, 3, padding=1, bias=False)
        self.cls_conv = tnn.Conv3d(cin, n_classes, 3, padding=1)
        from test_full_detector_parity import TorchScale
        self.scales = tnn.ModuleList([TorchScale() for _ in range(n_scales)])

    def forward(self, xs):
        return [(self.centerness_conv(x), torch.exp(scale(self.reg_conv(x))),
                 self.cls_conv(x)) for x, scale in zip(xs, self.scales)]


def test_full_scannet_fast_train_loss_parity():
    """The axis-aligned family end-to-end in train mode."""
    fpn_out, n_classes = 8, 3
    rng = np.random.RandomState(24)

    backbone = TorchResNet50().eval()
    neck = TorchFPN(out=fpn_out).eval()
    neck_3d = TorchFastNeck(cin=fpn_out, out=fpn_out).train()
    head = TorchScanNetHeadV2(fpn_out, n_classes, 3).eval()
    for m in (backbone, neck, neck_3d, head):
        _randomize_bn(m, rng)

    sd = {}
    for prefix, m in (('backbone', backbone), ('neck', neck),
                      ('neck_3d', neck_3d), ('bbox_head', head)):
        sd.update({f'{prefix}.{k}': v.detach().numpy()
                   for k, v in m.state_dict().items()})

    n_voxels = (8, 8, 4)
    head_cfg = IndoorHeadConfig(
        n_classes=n_classes, n_reg_outs=6, voxel_size=VOXEL_SIZE,
        dataset='scannet', version=2, centerness_topk=18, limit=27)
    cfg = ImVoxelNetConfig(
        n_voxels=n_voxels, voxel_size=VOXEL_SIZE,
        fpn_out_channels=fpn_out,
        neck=NeckConfig(kind='fast', in_channels=fpn_out,
                        out_channels=fpn_out, n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None, indoor_head=head_cfg)
    variables = ckpt.convert_reference_checkpoint(sd, cfg, strict=True)

    img, batch = _jax_batch()
    model = ImVoxelNet(cfg)

    grng = np.random.RandomState(57)
    g = 5
    extent = np.asarray(n_voxels) * np.asarray(VOXEL_SIZE)
    c = (grng.rand(g, 3) - 0.5) * extent * 0.7 + np.asarray(ORIGIN)
    size = np.exp(grng.uniform(np.log(.4), np.log(1.6), (g, 3)))
    boxes = np.concatenate([c, size, np.zeros((g, 1))], 1)
    boxes[:, 2] -= boxes[:, 5] / 2
    gt_boxes = boxes[None].astype(np.float32)
    gt_labels = grng.randint(0, n_classes, (1, g)).astype(np.int32)
    gt_mask = np.ones((1, g), bool)

    def jax_losses(variables, batch):
        outs, _ = model.apply(variables, batch, train=True,
                              mutable=['batch_stats'])
        head_outs, valid, f2d = outs
        return imvoxelnet_loss(cfg, head_outs, valid, f2d, batch), valid

    ours, valid = jax.jit(jax_losses)(
        variables, _with_gt(batch, gt_boxes, gt_labels, gt_mask))

    with torch.no_grad():
        t_img = torch.tensor(img[0].transpose(0, 3, 1, 2))
        feat = neck(backbone(t_img))[0]
        volume, t_valid = torch_extract_volume(
            feat, K, [np.eye(4, dtype=np.float32)], ORIGIN, RATIO,
            n_voxels, VOXEL_SIZE, (H, W))
        scales_out = neck_3d(volume[None])
        t_outs = head(scales_out)

    np.testing.assert_array_equal(np.asarray(valid[0]), t_valid[0].numpy())

    sizes = [tuple(t[0].shape[-3:]) for t in t_outs]
    scales_cat = torch.cat([
        torch.full((int(np.prod(s)),), i, dtype=torch.long)
        for i, s in enumerate(sizes)])
    pts = torch.cat(lp.torch_mlvl_points(
        sizes, VOXEL_SIZE, np.asarray(ORIGIN, np.float32)))
    vt = t_valid[:1][None].float()
    valid_lv = [torch.nn.Upsample(size=s, mode='trilinear')(vt)
                .round().bool().reshape(-1) for s in sizes]
    center = torch.cat([t[0][0].permute(1, 2, 3, 0).reshape(-1)
                        for t in t_outs])
    bbox = torch.cat([t[1][0].permute(1, 2, 3, 0).reshape(-1, 6)
                      for t in t_outs])
    cls = torch.cat([t[2][0].permute(1, 2, 3, 0).reshape(-1, n_classes)
                     for t in t_outs])
    lc, lb, lcls = lp.torch_indoor_v2_loss_single(
        center, bbox, cls, torch.cat(valid_lv), pts, scales_cat,
        torch.tensor(gt_boxes[0]),
        torch.tensor(gt_labels[0], dtype=torch.long), head_cfg)

    assert lb > 0
    for k, t in (('loss_centerness', lc), ('loss_bbox', lb),
                 ('loss_cls', lcls)):
        np.testing.assert_allclose(
            float(ours[k]), float(t), rtol=5e-3, atol=1e-5, err_msg=k)
