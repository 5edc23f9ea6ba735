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

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(feat, x, y, window: bool | None = None):
    """Sample ``feat (H, W, C)`` at float coords ``x, y (...,)``; zero pad.

    Coordinates and tap weights are computed in the coords' dtype (f32 from
    the offset conv — bf16 coords would quantize positions to ~0.5 px at
    x ~ 64), but the gathered values and the weighted sum ride ``feat``'s
    dtype: on hardware the (..., 9, C) sampling temps are the DCN step's
    dominant HBM stream (204 ms/step of the nuScenes train step, round-4
    trace) and bf16 halves it.

    Two bit-identical formulations (same rows, same weights, same add
    order), selected by ``window`` / ``IMVOXELNET_TPU_DCN_WINDOW_GATHER``:

    - row gathers (``window=False``, DEFAULT): 4 independent per-corner
      gathers of ``(N, C)`` rows from the flattened map.  Their BACKWARD is
      4 XLA row-scatter-adds — measured at 167.6 ms/step = 18% of the
      nuScenes train step (round-5 HLO-body attribution, the former
      "(no source)" bucket).
    - 2x2 window gather (``window=True``): ONE ``lax.gather`` of
      ``(N, 2, 2, C)`` patches at ``(clip(y0), clip(x0))`` starts; each
      corner's value is selected from the patch by its window-relative
      index, masked/weighted exactly as before — so autodiff emits one
      windowed scatter-add with 2x2xC contiguous updates instead of 4 row
      scatters.  Measured NEGATIVE, catastrophically: the nuScenes train
      step went 1014 -> 11031 ms/batch (round 5, hardware) — XLA:TPU
      lowers the multi-dim window gather/scatter far worse than flat row
      gathers.  Kept behind the env knob for re-testing on toolchain
      bumps; docs/performance.md round-5 DCN section.
    """
    if window is None:
        flag = os.environ.get('IMVOXELNET_TPU_DCN_WINDOW_GATHER', '').lower()
        window = flag not in ('', '0', 'false', 'no')
    h, w, c = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    if not window:
        corners = ((y0, x0, (1 - dx) * (1 - dy)),
                   (y0, x0 + 1, dx * (1 - dy)),
                   (y0 + 1, x0, (1 - dx) * dy),
                   (y0 + 1, x0 + 1, dx * dy))
        stacked = os.environ.get('IMVOXELNET_TPU_DCN_STACKED_GATHER',
                                 '').lower() not in ('', '0', 'false', 'no')
        if stacked:
            # One gather of all 4 corners' rows -> autodiff emits ONE
            # backward scatter-add of 4N rows instead of 4 scatters of N
            # rows (same rows, same weights, same add order as the default
            # path — bit-identical forward).  Experiment knob; see
            # docs/performance.md round-5 DCN section for the measurement.
            flats, insides, wgts = [], [], []
            for yi, xi, wgt in corners:
                insides.append((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                flats.append(jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
                             + jnp.clip(xi, 0, w - 1).astype(jnp.int32))
                wgts.append(wgt)
            vals = feat.reshape(-1, feat.shape[-1])[jnp.stack(flats)]
            out = None
            for i in range(4):
                term = (jnp.where(insides[i][..., None], vals[i], 0)
                        * wgts[i][..., None].astype(feat.dtype))
                out = term if out is None else out + term
            return out

        def tap(yi, xi, wgt):
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            vals = feat.reshape(-1, feat.shape[-1])[yi_c * w + xi_c]
            return (jnp.where(inside[..., None], vals, 0)
                    * wgt[..., None].astype(feat.dtype))

        return (tap(*corners[0]) + tap(*corners[1])
                + tap(*corners[2]) + tap(*corners[3]))

    # window starts clipped so the 2x2 patch stays in bounds; an in-bounds
    # corner (yi, xi) is then always at window-relative index
    # (yi - ys, xi - xs) in {0, 1}^2, out-of-bounds corners are masked to 0
    # exactly like the row-gather path
    ys = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    xs = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    starts = jnp.stack([ys, xs], axis=-1).reshape(-1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    win = jax.lax.gather(feat, starts, dnums, slice_sizes=(2, 2, c),
                         mode=jax.lax.GatherScatterMode.CLIP)
    win = win.reshape(x.shape + (2, 2, c))              # (..., 2, 2, C)

    out = None
    for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):     # row-gather order
        yi = y0 + cy
        xi = x0 + cx
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        ry = (yi.astype(jnp.int32) - ys)[..., None]     # 0/1 when inside
        rx = (xi.astype(jnp.int32) - xs)[..., None]
        row = jnp.where(ry == 0, win[..., 0, :, :].reshape(x.shape + (2 * c,)),
                        win[..., 1, :, :].reshape(x.shape + (2 * c,)))
        row = row.reshape(x.shape + (2, c))
        vals = jnp.where(rx == 0, row[..., 0, :], row[..., 1, :])
        wgt = ((1 - dx) if cx == 0 else dx) * ((1 - dy) if cy == 0 else dy)
        term = (jnp.where(inside[..., None], vals, 0)
                * wgt[..., None].astype(feat.dtype))
        out = term if out is None else out + term
    return out


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
