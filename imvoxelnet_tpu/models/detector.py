"""The ImVoxelNet detector: backbone -> FPN -> unprojection -> 3D neck -> head.

Parity: ``ImVoxelNet`` (``mmdet3d/models/detectors/imvoxelnet.py:9-129``),
re-architected for XLA: the reference's per-sample python loop over the batch
(``imvoxelnet.py:58-76``) and per-view loop inside ``backproject``
(``imvoxelnet.py:156-157``) become a single vmapped + scanned computation with
static shapes; variable image sizes are handled by padding + a per-sample
``(h, w)`` validity extent instead of slicing.

Batch layout (everything fixed-shape):
  images      (B, V, H, W, 3)   normalized, padded
  intrinsics  (B, 3, 3)
  extrinsics  (B, V, 4, 4)
  origins     (B, 3)
  img_shape   (B, 2) int        resized (pre-pad) image (h, w)
  ratios      (B,) float        ori_h / (img_h / stride)  (imvoxelnet.py:118)
  gt_boxes    (B, G, 7) bottom-center | gt_labels (B, G) | gt_mask (B, G)
  gt_angles   (B, 2), gt_layout (B, 7)   (Total3D only)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import backproject as bp
from . import fpn as fpn_lib
from . import necks3d
from . import resnet as resnet_lib
from .heads import anchor3d_head as a3d
from .heads import imvoxel_heads as ivh
from .heads import layout_head as lh


@dataclasses.dataclass(frozen=True)
class NeckConfig:
    kind: str = 'kitti'            # kitti | nuscenes | imvoxel | fast
    in_channels: int = 64
    out_channels: int = 256
    # imvoxel neck
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    down_layers: Tuple[int, ...] = (1, 2, 3, 4)
    up_layers: Tuple[int, ...] = (3, 2, 1)
    # fast neck
    n_blocks: Tuple[int, ...] = (1, 1, 1)


@dataclasses.dataclass(frozen=True)
class ImVoxelNetConfig:
    n_voxels: Tuple[int, int, int] = (216, 248, 12)
    voxel_size: Tuple[float, float, float] = (0.32, 0.32, 0.32)
    fpn_out_channels: int = 64
    neck: NeckConfig = NeckConfig()
    head_kind: str = 'anchor3d'    # anchor3d | indoor
    anchor_head: Optional[a3d.Anchor3DHeadConfig] = a3d.Anchor3DHeadConfig()
    indoor_head: Optional[ivh.IndoorHeadConfig] = None
    layout_head: Optional[lh.LayoutHeadConfig] = None
    axis_name: Optional[str] = None
    # Indoor-head positive-count normalization under data parallelism
    # (docs/parity.md "DP training semantics"):
    #   'per_image'  — each image's losses normalize by ITS positive count;
    #                  exact reference semantics at world size 1, and under
    #                  shard_map DP where axis_name pmean reproduces the
    #                  cross-rank reduce_mean (imvoxel_head.py:196).
    #   'batch_mean' — every image normalizes by the global-batch MEAN
    #                  count; the production GSPMD multi-chip analog of the
    #                  reference's cross-rank reduce_mean (group widened
    #                  from world-size to the whole global batch — exact at
    #                  samples_per_gpu=1, lower-variance at >1).
    dp_loss_norm: str = 'per_image'
    stride: int = 4                 # asserted == 4 in the reference
    compute_dtype: str = 'float32'  # conv-path dtype; 'bfloat16' on TPU
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    # Bottlenecks per stage; (3, 4, 6, 3) = the reference's ResNet-50
    # (``pretrained='torchvision://resnet50'``).  Tiny-test configs shrink
    # this so CPU-mesh compiles stay cheap while keeping the real structure.
    backbone_stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    # When set, __call__ expects to run INSIDE shard_map with the view axis
    # of images/extrinsics sharded over this mesh axis: backbone+FPN+gather
    # run on the local view shard, the per-voxel (sum, count) pair is
    # psum-ed, and the 3D neck + heads run replicated on the pooled volume
    # (SURVEY.md §5's sequence-parallel analog for the 50-view ScanNet test,
    # ``imvoxelnet_scannet.py:66``).  See ``parallel.mesh.view_sharded_forward``.
    view_shard_axis: Optional[str] = None


def build_neck(cfg: NeckConfig, axis_name, dtype):
    if cfg.kind == 'kitti':
        return necks3d.KittiImVoxelNeck(cfg.in_channels, cfg.out_channels,
                                        axis_name, dtype, name='neck_3d')
    if cfg.kind == 'nuscenes':
        return necks3d.NuScenesImVoxelNeck(cfg.in_channels, cfg.out_channels,
                                           axis_name, dtype, name='neck_3d')
    if cfg.kind == 'imvoxel':
        return necks3d.ImVoxelNeck(cfg.channels, cfg.out_channels,
                                   cfg.down_layers, cfg.up_layers,
                                   axis_name, dtype, name='neck_3d')
    if cfg.kind == 'fast':
        return necks3d.FastIndoorImVoxelNeck(cfg.in_channels, cfg.n_blocks,
                                             cfg.out_channels, axis_name,
                                             dtype, name='neck_3d')
    raise ValueError(cfg.kind)


class ImVoxelNet(nn.Module):
    cfg: ImVoxelNetConfig

    @nn.compact
    def __call__(self, batch, train: bool, use_predicted_extrinsics: bool = False):
        """Returns (head_outs, valids, features_2d).

        ``use_predicted_extrinsics`` mirrors the reference's test-time switch
        to LayoutHead-predicted pitch/roll (``imvoxelnet.py:59-61, 120-126``).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        images = batch['images']
        b, v, h, w, _ = images.shape
        flat = images.reshape(b * v, h, w, 3)

        feats = resnet_lib.ResNet(
            stage_blocks=tuple(cfg.backbone_stage_blocks), dtype=dtype,
            stage_with_dcn=tuple(cfg.stage_with_dcn), name='backbone')(flat)

        features_2d = None
        if cfg.layout_head is not None:
            c5 = feats[-1].reshape(b, v, *feats[-1].shape[1:])[:, 0]
            features_2d = lh.LayoutHead(cfg.layout_head, name='head_2d')(
                c5.astype(jnp.float32), train)

        x = fpn_lib.FPN(cfg.fpn_out_channels, dtype, name='neck')(feats)[0]
        hf, wf = x.shape[1:3]
        assert h // hf == cfg.stride, (h, hf)
        x = x.reshape(b, v, hf, wf, -1)

        extrinsics = batch['extrinsics']
        if use_predicted_extrinsics and features_2d is not None:
            angles = features_2d[0]
            pred_ext = lh.predicted_extrinsics(angles)     # (B, 4, 4)
            extrinsics = jnp.broadcast_to(
                pred_ext[:, None], extrinsics.shape)

        nx, ny, nz = cfg.n_voxels
        projections = jax.vmap(bp.compute_projection)(
            batch['intrinsics'], extrinsics, batch['ratios'])
        points = jax.vmap(
            lambda o: bp.get_points(cfg.n_voxels, cfg.voxel_size, o)
        )(batch['origins']).reshape(b, -1, 3)
        valid_hw = batch['img_shape'] // cfg.stride

        # single voxel-major gather for the whole batch: output rows land in
        # the (x, y, z, B, C) physical order the NDHWC 3D convs want
        acc, cnt = bp.backproject_batch(x, points, projections, valid_hw,
                                        axis_name=cfg.view_shard_axis)
        if cfg.view_shard_axis is not None:
            # view-parallel: v above is the LOCAL view count; pool globally
            acc = jax.lax.psum(acc, cfg.view_shard_axis)
            cnt = jax.lax.psum(cnt, cfg.view_shard_axis)
            vol, seen = bp.mean_pool_from_sums(acc, cnt)
        else:
            vol, seen = bp.mean_pool_from_sums(acc, cnt, n_views=v)
        volume = jnp.transpose(
            vol.reshape(nx, ny, nz, b, -1), (3, 0, 1, 2, 4))
        valid = jnp.transpose(seen.reshape(nx, ny, nz, b), (3, 0, 1, 2))

        neck_outs = build_neck(cfg.neck, cfg.axis_name, dtype)(volume, train)

        if cfg.head_kind == 'anchor3d':
            head_outs = a3d.Anchor3DHead(cfg.anchor_head, dtype,
                                         name='bbox_head')(neck_outs[0])
        else:
            head_outs = ivh.IndoorHead(cfg.indoor_head, cfg.axis_name, dtype,
                                       name='bbox_head')(neck_outs, train)
        return head_outs, valid, features_2d


def imvoxelnet_loss(cfg: ImVoxelNetConfig, head_outs, valid, features_2d,
                    batch):
    """Training losses (``imvoxelnet.py:82-87``)."""
    if cfg.head_kind == 'anchor3d':
        losses = a3d.anchor3d_head_loss(
            head_outs, batch['gt_boxes'], batch['gt_labels'],
            batch['gt_mask'], cfg.anchor_head, cfg.axis_name)
    else:
        losses = ivh.indoor_head_loss(
            head_outs, valid, batch['origins'], batch['gt_boxes'],
            batch['gt_labels'], batch['gt_mask'], cfg.indoor_head,
            cfg.axis_name, batch_mean=(cfg.dp_loss_norm == 'batch_mean'))
    if cfg.layout_head is not None and features_2d is not None:
        angles, layouts = features_2d
        losses.update(lh.layout_head_loss(
            angles, layouts, batch['gt_angles'], batch['gt_layout'],
            cfg.layout_head))
    return losses


def imvoxelnet_predict(cfg: ImVoxelNetConfig, head_outs, valid, features_2d,
                       batch):
    """Test-time detections (``imvoxelnet.py:93-106``), fixed-shape."""
    if cfg.head_kind == 'anchor3d':
        results = a3d.anchor3d_head_get_bboxes(head_outs, cfg.anchor_head)
    else:
        results = ivh.indoor_head_get_bboxes(
            head_outs, valid, batch['origins'], cfg.indoor_head)
    if cfg.layout_head is not None and features_2d is not None:
        angles, layouts = features_2d
        results['angles'] = angles
        results['layout'] = layouts
    return results
