"""DCNv2 (modulated deformable convolution), pure XLA.

The reference's nuScenes backbone enables mmcv's CUDA DCNv2 in ResNet stages
3-4 (``configs/imvoxelnet/imvoxelnet_nuscenes.py:13-14``).  The TPU-native
formulation: a regular conv predicts per-position offsets (2*K) and
modulation masks (K); each of the K taps is sampled bilinearly at
``base_grid + dilation_offset + learned_offset`` (an XLA gather over the
feature map), modulated, and the K sampled maps contract with the kernel as
one big matmul — i.e. im2col with learned fractional positions, which maps
straight onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(feat, x, y):
    """Sample ``feat (H, W, C)`` at float coords ``x, y (...,)``; zero pad.

    Coordinates and tap weights are computed in the coords' dtype (f32 from
    the offset conv — bf16 coords would quantize positions to ~0.5 px at
    x ~ 64), but the gathered values and the weighted sum ride ``feat``'s
    dtype: on hardware the (..., 9, C) sampling temps are the DCN step's
    dominant HBM stream (204 ms/step of the nuScenes train step, round-4
    trace) and bf16 halves it.
    """
    h, w, _ = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def tap(yi, xi, wgt):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = feat.reshape(-1, feat.shape[-1])[yi_c * w + xi_c]
        return (jnp.where(inside[..., None], vals, 0)
                * wgt[..., None].astype(feat.dtype))

    return (tap(y0, x0, (1 - dx) * (1 - dy))
            + tap(y0, x0 + 1, dx * (1 - dy))
            + tap(y0 + 1, x0, (1 - dx) * dy)
            + tap(y0 + 1, x0 + 1, dx * dy))


class DeformConv2d(nn.Module):
    """3x3 modulated deformable conv (DCNv2), stride 1 or 2, NHWC."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = 9
        # offset/mask conv initialised to zero like mmcv's conv_offset
        om = nn.Conv(3 * k, (3, 3), strides=(self.stride, self.stride),
                     padding=((1, 1), (1, 1)),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=jnp.float32, name='conv_offset')(
                         x.astype(jnp.float32))
        oh, ow = om.shape[1:3]
        offset = om[..., :2 * k]
        mask = jax.nn.sigmoid(om[..., 2 * k:])              # (B, oh, ow, 9)

        # base sampling grid (tap-major order: dy, dx in {-1, 0, 1})
        ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) * self.stride
        xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) * self.stride
        taps_dy = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.float32)
        taps_dx = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.float32)

        def sample_image(feat, off, m):
            # off: (oh, ow, 18) ordered (dy0, dx0, dy1, dx1, ...) like mmcv
            off = off.reshape(oh, ow, k, 2)
            sy = ys[..., None] + taps_dy + off[..., 0]
            sx = xs[..., None] + taps_dx + off[..., 1]
            # sampling rides self.dtype (bf16 on hw) — see bilinear_sample
            vals = bilinear_sample(feat.astype(self.dtype), sx, sy)
            return vals * m[..., None].astype(self.dtype)    # (oh, ow, 9, C)

        # remat: the (B, oh, ow, 9, C) sampling temps (9-tap dim pads
        # 1.8x under TPU tiling) OOM the nuScenes train step if stored for
        # the backward; recomputing them is cheap next to the matmul
        sampled = jax.checkpoint(jax.vmap(sample_image))(x, offset, mask)
        sampled = sampled.reshape(b, oh, ow, k * c).astype(self.dtype)
        kernel = self.param(
            'kernel', nn.initializers.he_normal(), (3, 3, c, self.features))
        w_flat = kernel.reshape(k * c, self.features).astype(self.dtype)
        return sampled @ w_flat
