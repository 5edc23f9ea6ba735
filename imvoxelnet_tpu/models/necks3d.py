"""3D convolutional necks, Flax / NDHWC (volume layout ``(B, nx, ny, nz, C)``).

Reimplements the four necks of ``mmdet3d/models/necks/imvoxelnet.py``:
  - ``KittiImVoxelNeck``        (:94-123)  z-collapsing BEV neck (outdoor)
  - ``NuScenesImVoxelNeck``     (:126-154) same with stride-2 first conv
  - ``ImVoxelNeck``             (:70-91)   Atlas-style 3-scale encoder-decoder
  - ``FastIndoorImVoxelNeck``   (:9-67)    transpose-conv FPN-like v3 neck

All BatchNorms run in train mode with batch statistics (torch momentum 0.1 ->
flax momentum 0.9); pass ``axis_name`` to sync statistics across the data mesh
axis (the reference trains with per-GPU batch 1-4, so cross-replica stats are
what the published checkpoints saw via plain BN over the local batch — we keep
``axis_name=None`` for parity and expose syncing as an option).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.ops.conv3z_pallas import conv3z_lanepack

# Plane-size threshold shared by both shallow-z conv specializations; tests
# lower it to exercise the gates on CPU-sized volumes.
_CONV3Z_MIN_PLANE = 16384


class BN(nn.Module):
    """BatchNorm3d twin: torch eps/momentum, optional cross-replica sync."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name='bn')(x)


def _conv3z_same(x, kernel):
    """3x3x3 SAME conv that never multiplies z-padding zeros.

    The voxel volumes here are shallow in z (KITTI block2 runs at nz=3,
    the fast indoor necks at nz=4), so the z-axis padding taps of a SAME
    conv are a large fraction of the MXU work — 2/9 of all MACs at nz=3 —
    spent multiplying zeros.  Decompose along OUTPUT z instead: interior
    slices via one VALID-z 3D conv over the full volume, plus one 2-tap
    conv per boundary slice; x/y stay SAME-padded (their pad fraction is
    <1%).  Same math as the dense SAME conv (padding contributes 0), fewer
    executed MACs; summation order differs so results match to float
    tolerance, not bit-exactly.
    """
    dn = ('NDHWC', 'DHWIO', 'NDHWC')
    xy = ((1, 1), (1, 1))
    mid = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), padding=xy + ((0, 0),), dimension_numbers=dn)
    top = jax.lax.conv_general_dilated(
        x[:, :, :, :2], kernel[:, :, 1:], (1, 1, 1),
        padding=xy + ((0, 0),), dimension_numbers=dn)
    bot = jax.lax.conv_general_dilated(
        x[:, :, :, -2:], kernel[:, :, :2], (1, 1, 1),
        padding=xy + ((0, 0),), dimension_numbers=dn)
    return jnp.concatenate([top, mid, bot], axis=3)


class Conv3x3x3(nn.Module):
    """Drop-in twin of ``nn.Conv(features, (3,3,3), use_bias=False)`` —
    identical parameter tree ('kernel', same shape/init) — that routes
    stride-1 SAME convs on shallow-z volumes through :func:`_conv3z_same`."""

    features: int
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # Lane-packed Pallas kernel for the lane-bound 64->64 block0 convs
        # (MXU output lanes half-filled; see ops/conv3z_pallas.py).  Opt-in
        # via env until the hardware microbench justifies the default; the
        # flag is read at trace time (same caveat as ops/iou.py:_use_pallas).
        if (os.environ.get('IMVOXELNET_TPU_CONV3Z_PALLAS', '0') == '1'
                and self.stride == (1, 1, 1) and self.padding == (1, 1, 1)
                and x.shape[-1] == 64 and self.features == 64
                and 6 <= x.shape[3] <= 16
                and x.shape[1] * x.shape[2] >= _CONV3Z_MIN_PLANE):
            return conv3z_lanepack(x, kernel)
        # Decompose only when the x/y plane is large enough for the skipped
        # z-pad MACs to dominate the extra conv launches + concat: measured
        # on hardware, KITTI block2 (216x248 plane, nz=3) gains +6.6%
        # end-to-end while the indoor fast neck (40x40 plane, nz=4) LOSES
        # ~8% — small volumes are overhead-bound, not MAC-bound.
        if (self.stride == (1, 1, 1) and self.padding == (1, 1, 1)
                and 3 <= x.shape[3] <= 4
                and x.shape[1] * x.shape[2] >= _CONV3Z_MIN_PLANE):
            return _conv3z_same(x, kernel)
        return jax.lax.conv_general_dilated(
            x, kernel, self.stride,
            padding=tuple((p, p) for p in self.padding),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


def conv3(features, stride=1, padding=1, name=None, dtype=jnp.float32):
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    return Conv3x3x3(features, stride=stride, padding=padding,
                     dtype=dtype, name=name)


class ConvBnRelu3d(nn.Module):
    features: int
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    use_bias: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3, 3), strides=self.stride,
                    padding=tuple((p, p) for p in self.padding),
                    use_bias=self.use_bias, dtype=self.dtype, name='conv')(x)
        x = BN(self.axis_name, self.dtype, name='norm')(x, train)
        return nn.relu(x)


class BasicBlock3d(nn.Module):
    """Residual 3x3x3 block (``necks/imvoxelnet.py:191-230``).

    ``zero_init_bn2`` reproduces the encoder-decoder's zero-initialized last
    BN (``necks/imvoxelnet.py:340-343``).
    """

    planes: int
    stride: int = 1
    zero_init_bn2: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv3(self.planes, self.stride, name='conv1',
                    dtype=self.dtype)(x)
        out = BN(self.axis_name, self.dtype, name='bn1')(out, train)
        out = nn.relu(out)
        out = conv3(self.planes, name='conv2', dtype=self.dtype)(out)
        bn2 = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            scale_init=(nn.initializers.zeros if self.zero_init_bn2
                        else nn.initializers.ones),
            name='bn2')
        out = bn2(out)
        # reference BasicBlock3d never downsamples in the imvoxelnet configs
        return nn.relu(out + identity)


class BasicBlock3dV2(nn.Module):
    """v3-neck residual block with 1x1x1 downsample (``:233-260``)."""

    features: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv3(self.features, self.stride, name='conv1',
                    dtype=self.dtype)(x)
        out = BN(self.axis_name, self.dtype, name='norm1')(out, train)
        out = nn.relu(out)
        out = conv3(self.features, name='conv2', dtype=self.dtype)(out)
        out = BN(self.axis_name, self.dtype, name='norm2')(out, train)
        if self.stride != 1:
            identity = nn.Conv(self.features, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = BN(self.axis_name, self.dtype,
                          name='downsample_norm')(identity, train)
        return nn.relu(out + identity)


class KittiImVoxelNeck(nn.Module):
    """Outdoor z-collapsing neck (``necks/imvoxelnet.py:94-123``).

    Input ``(B, nx, ny, nz, C)``; three stride-(1,1,2) convs collapse nz
    (12 -> 6 -> 3 -> 1 with the final padding-0 conv, which also shrinks
    nx, ny by 2).  Output is a single BEV map ``(B, ny-2, nx-2, C_out)`` —
    transposed to (row=y, col=x) exactly like ``x[..., 0].transpose(-1, -2)``.
    """

    in_channels: int = 64
    out_channels: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.axis_name
        c = self.in_channels
        x = x.astype(self.dtype)
        x = BasicBlock3d(c, axis_name=a, dtype=self.dtype,
                         name='block0')(x, train)
        x = ConvBnRelu3d(c * 2, (1, 1, 2), (1, 1, 1), axis_name=a,
                         dtype=self.dtype, name='down0')(x, train)
        x = BasicBlock3d(c * 2, axis_name=a, dtype=self.dtype,
                         name='block1')(x, train)
        x = ConvBnRelu3d(c * 4, (1, 1, 2), (1, 1, 1), axis_name=a,
                         dtype=self.dtype, name='down1')(x, train)
        x = BasicBlock3d(c * 4, axis_name=a, dtype=self.dtype,
                         name='block2')(x, train)
        x = ConvBnRelu3d(self.out_channels, (1, 1, 1), (0, 0, 0), axis_name=a,
                         dtype=self.dtype, name='out_conv')(x, train)
        assert x.shape[3] == 1, f'z must collapse to 1, got {x.shape}'
        bev = x[:, :, :, 0, :]                 # (B, nx-2, ny-2, C)
        return [jnp.transpose(bev, (0, 2, 1, 3))]  # (B, ny-2, nx-2, C)


class NuScenesImVoxelNeck(nn.Module):
    """Same pattern, first conv stride-2 everywhere (``:126-154``)."""

    in_channels: int = 64
    out_channels: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.axis_name
        c = self.in_channels
        x = x.astype(self.dtype)
        x = BasicBlock3d(c, axis_name=a, dtype=self.dtype,
                         name='block0')(x, train)
        x = ConvBnRelu3d(c * 2, (2, 2, 2), (1, 1, 1), axis_name=a,
                         dtype=self.dtype, name='down0')(x, train)
        x = BasicBlock3d(c * 2, axis_name=a, dtype=self.dtype,
                         name='block1')(x, train)
        x = ConvBnRelu3d(c * 4, (1, 1, 2), (1, 1, 1), axis_name=a,
                         dtype=self.dtype, name='down1')(x, train)
        x = BasicBlock3d(c * 4, axis_name=a, dtype=self.dtype,
                         name='block2')(x, train)
        x = ConvBnRelu3d(self.out_channels, (1, 1, 1), (1, 1, 0), axis_name=a,
                         dtype=self.dtype, name='out_conv')(x, train)
        assert x.shape[3] == 1, f'z must collapse to 1, got {x.shape}'
        bev = x[:, :, :, 0, :]
        return [jnp.transpose(bev, (0, 2, 1, 3))]


def _trilinear_up2(x):
    """Trilinear x2 upsampling, align_corners=False (torch interpolate twin)."""
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, d * 2, h * 2, w * 2, c), method='linear')


class ImVoxelNeck(nn.Module):
    """Atlas-style encoder-decoder + per-scale out convs (``:70-91, 297-372``).

    Returns 3 scales finest-first: ``[(B, nx, ny, nz, C_out), /2, /4]``.
    ``conditional=False`` in every shipped config, so the skip projection is a
    plain conv-bn-relu.
    """

    channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 64
    down_layers: Sequence[int] = (1, 2, 3, 4)
    up_layers: Sequence[int] = (3, 2, 1)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.axis_name
        x = x.astype(self.dtype)
        chans = list(self.channels)

        # --- encoder
        xs = []
        for i, ch in enumerate(chans):
            if i > 0:
                x = nn.Conv(ch, (3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1),) * 3, use_bias=False,
                            dtype=self.dtype, name=f'down_conv_{i}')(x)
                x = BN(a, self.dtype, name=f'down_bn_{i}')(x, train)
                x = nn.relu(x)
            for j in range(self.down_layers[i]):
                x = BasicBlock3d(ch, zero_init_bn2=True, axis_name=a,
                                 dtype=self.dtype,
                                 name=f'down_{i}_{j}')(x, train)
            xs.append(x)

        # --- decoder (coarse -> fine), skip projection, (x + y) / 2 merge
        xs = xs[::-1]
        rev = chans[::-1]
        outs = []
        for i in range(len(rev) - 1):
            x = _trilinear_up2(x)
            x = nn.Conv(rev[i + 1], (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name=f'up_conv_{i}')(x)
            y = nn.Conv(rev[i + 1], (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name=f'proj_conv_{i}')(xs[i + 1])
            y = BN(a, self.dtype, name=f'proj_bn_{i}')(y, train)
            y = nn.relu(y)
            x = (x + y) / 2.0
            for j in range(self.up_layers[i]):
                x = BasicBlock3d(rev[i + 1], zero_init_bn2=True, axis_name=a,
                                 dtype=self.dtype,
                                 name=f'up_{i}_{j}')(x, train)
            outs.append(x)

        # finest-first + per-scale out conv (``necks/imvoxelnet.py:86-88``)
        outs = outs[::-1]
        results = []
        for i, o in enumerate(outs):
            o = nn.Conv(self.out_channels, (3, 3, 3), padding=((1, 1),) * 3,
                        dtype=self.dtype, name=f'out_conv_{i}')(o)
            o = BN(a, self.dtype, name=f'out_bn_{i}')(o, train)
            results.append(nn.relu(o))
        return results


class FastIndoorImVoxelNeck(nn.Module):
    """v3 simplified neck (``necks/imvoxelnet.py:9-67``), finest-first output."""

    in_channels: int = 256
    n_blocks: Sequence[int] = (1, 1, 1)
    out_channels: int = 128
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.axis_name
        x = x.astype(self.dtype)
        n_scales = len(self.n_blocks)
        ch = self.in_channels

        down_outs = []
        chans = []
        for i in range(n_scales):
            stride = 1 if i == 0 else 2
            for j in range(self.n_blocks[i]):
                if j == 0 and stride != 1:
                    ch = ch * 2
                    x = BasicBlock3dV2(ch, stride, axis_name=a,
                                       dtype=self.dtype,
                                       name=f'down_{i}_{j}')(x, train)
                else:
                    x = BasicBlock3dV2(ch, 1, axis_name=a, dtype=self.dtype,
                                       name=f'down_{i}_{j}')(x, train)
            down_outs.append(x)
            chans.append(ch)

        outs = []
        for i in range(n_scales - 1, -1, -1):
            if i < n_scales - 1:
                # up_block_{i+1}: convT(2, 2) + bn + relu + conv3 + bn + relu
                x = nn.ConvTranspose(chans[i], (2, 2, 2), strides=(2, 2, 2),
                                     use_bias=False, transpose_kernel=True,
                                     dtype=self.dtype,
                                     name=f'up_convt_{i + 1}')(x)
                x = BN(a, self.dtype, name=f'up_bn1_{i + 1}')(x, train)
                x = nn.relu(x)
                x = conv3(chans[i], name=f'up_conv_{i + 1}',
                          dtype=self.dtype)(x)
                x = BN(a, self.dtype, name=f'up_bn2_{i + 1}')(x, train)
                x = nn.relu(x)
                x = down_outs[i] + x
            o = conv3(self.out_channels, name=f'out_conv_{i}',
                      dtype=self.dtype)(x)
            o = BN(a, self.dtype, name=f'out_bn_{i}')(o, train)
            outs.append(nn.relu(o))
        return outs[::-1]
