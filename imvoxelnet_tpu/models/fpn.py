"""Feature Pyramid Network (mmdet-compatible), Flax / NHWC.

Parity: mmdet ``FPN`` as configured by every imvoxelnet config
(``configs/imvoxelnet/imvoxelnet_kitti.py:13-17``): 4 lateral 1x1 convs,
top-down nearest-neighbour upsampling with add, 4 output 3x3 convs, no norm,
``num_outs = len(in_channels)`` (no extra levels).  Only ``outs[0]`` (stride 4)
is consumed by the detector (``imvoxelnet.py:50-54``), but all levels are
built so converted reference checkpoints load loss-free.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest_2x(x, out_hw):
    """Nearest upsample to ``out_hw`` (handles odd sizes like torch interpolate)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if oh == 2 * h and ow == 2 * w:
        # exact 2x: broadcast-reshape writes the output once; the general
        # path's two chained gathers materialize an (n, oh, w, c)
        # intermediate as well.  Bit-identical selection (out[i, j] =
        # x[i//2, j//2] either way); the 50-view ScanNet FPN is HBM-bound
        # (docs/performance.md round 5), so bytes are the cost here.
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        return y.reshape(n, oh, ow, c)
    # nearest with scale factor: index mapping floor(i * h / oh)
    rows = (jnp.arange(oh) * h) // oh
    cols = (jnp.arange(ow) * w) // ow
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    out_channels: int = 64
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        n_levels = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(inputs[i])
            for i in range(n_levels)
        ]
        for i in range(n_levels - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f'fpn_{i}')(laterals[i])
            for i in range(n_levels)
        ]
        return outs
