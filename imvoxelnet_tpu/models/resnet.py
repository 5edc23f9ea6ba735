"""ResNet backbone in Flax (NHWC), matching the reference's 2D backbone.

The reference uses mmdet's torchvision-style ResNet-50 with
``frozen_stages=1``, ``norm_cfg=dict(type='BN', requires_grad=False)`` and
``norm_eval=True`` (``configs/imvoxelnet/imvoxelnet_kitti.py:4-12``): every
batch-norm runs in inference mode with fixed running statistics, and the stem
+ stage 1 get no gradient.  We therefore model backbone BN as a
``FrozenBatchNorm`` whose statistics and affine are plain (optimizer-masked)
parameters — exactly reproducible from a torchvision checkpoint, and trivially
fused by XLA into the preceding convolution.

Layout: NHWC images, HWIO kernels; bottleneck style 'pytorch' (stride-2 on the
3x3 conv), matching ``pretrained='torchvision://resnet50'`` weights.
``dtype`` is the computation dtype (bf16 on TPU for speed); parameters stay
float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with parameters frozen via optimizer mask."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        mean = self.param('mean', nn.initializers.zeros, (c,))
        var = self.param('var', nn.initializers.ones, (c,))
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(self.dtype)
        shift = (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(
            self.dtype)
        return x.astype(self.dtype) * inv + shift


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32
    with_dcn: bool = False   # DCNv2 on conv2 (nuScenes stages 3-4)

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        if self.with_dcn:
            from .dcn import DeformConv2d
            out = DeformConv2d(self.planes, stride=self.stride,
                               dtype=self.dtype, name='conv2')(out)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name='conv2')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name='downsample_bn')(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-50/101 with bottleneck blocks.

    Returns the 4 stage outputs (C2..C5) like mmdet's ``out_indices=(0,1,2,3)``.
    """

    stage_blocks: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    base_planes: int = 64
    dtype: Any = jnp.float32
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_planes, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name='conv1')(x)
        x = FrozenBatchNorm(dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_planes
        for stage, n_blocks in enumerate(self.stage_blocks):
            stride = 1 if stage == 0 else 2
            for block in range(n_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block == 0 else 1,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    with_dcn=self.stage_with_dcn[stage],
                    name=f'layer{stage + 1}_{block}')(x)
            outs.append(x)
            planes *= 2
        return outs


def resnet50(dtype=jnp.float32, stage_with_dcn=(False, False, False, False)):
    return ResNet(stage_blocks=(3, 4, 6, 3), dtype=dtype,
                  stage_with_dcn=tuple(stage_with_dcn))
