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
