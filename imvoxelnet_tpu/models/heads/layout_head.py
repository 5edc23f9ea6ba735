"""Camera pose (pitch/roll) + room layout head for Total3DUnderstanding.

Parity: ``LayoutHead`` (``mmdet3d/models/dense_heads/layout_head.py:8-117``):
two 3-layer MLPs on the globally average-pooled ResNet C5 features; angles
are period-limited, layout sizes exponentiated; losses are a sin-difference
SmoothL1 (weight 100) per angle and a rotated IoU3D loss on the 7-DoF layout
box (``configs/imvoxelnet/imvoxelnet_total_sunrgbd.py:13-19``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops
from ...ops import losses as loss_ops


@dataclasses.dataclass(frozen=True)
class LayoutHeadConfig:
    linear_size: int = 256
    dropout: float = 0.0
    loss_angle_weight: float = 100.0
    loss_layout_weight: float = 1.0


class LayoutHead(nn.Module):
    cfg: LayoutHeadConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) C5 features -> angles (B, 2), layout (B, 7) gc."""
        cfg = self.cfg
        feat = x.mean(axis=(1, 2))

        def mlp(h, out, name):
            h = nn.Dense(cfg.linear_size, name=f'{name}_fc1')(h)
            h = nn.relu(h)
            h = nn.Dense(cfg.linear_size, name=f'{name}_fc2')(h)
            h = nn.relu(h)
            return nn.Dense(out, name=f'{name}_fc3')(h)

        angles = box_ops.limit_period(mlp(feat, 2, 'angle'))
        raw = mlp(feat, 7, 'layout')
        layout = jnp.concatenate(
            [raw[:, :3], jnp.exp(raw[:, 3:6]), raw[:, 6:7]], axis=-1)
        return angles, layout


def layout_head_loss(angles, layouts, gt_angles, gt_layouts,
                     cfg: LayoutHeadConfig):
    """Batch loss (``layout_head.py:78-106``).

    Args:
      angles/layouts: head outputs ``(B, 2)`` / ``(B, 7)`` (gravity-center).
      gt_angles: ``(B, 2)``; gt_layouts: ``(B, 7)`` bottom-center boxes.
    """
    def angle_loss(a, gt):
        return loss_ops.smooth_l1_loss(
            jnp.sin(a) * jnp.cos(gt), jnp.cos(a) * jnp.sin(gt),
            beta=1.0, avg_factor=1.0, loss_weight=cfg.loss_angle_weight)

    pitch = jax.vmap(lambda a, g: angle_loss(a[0], g[0]))(angles, gt_angles)
    roll = jax.vmap(lambda a, g: angle_loss(a[1], g[1]))(angles, gt_angles)
    gt_gc = box_ops.with_gravity_center(gt_layouts)
    layout_l = jax.vmap(
        lambda p, t: loss_ops.iou_3d_loss(
            p, t, avg_factor=1.0, loss_weight=cfg.loss_layout_weight)
    )(layouts, gt_gc)
    return dict(angle_loss=jnp.mean(pitch + roll),
                layout_loss=jnp.mean(layout_l))


def predicted_extrinsics(angles):
    """Extrinsics from predicted (pitch, roll) for the SUNRGBDTotal test path.

    Parity: ``get_extrinsics`` (``imvoxelnet.py:163-187``), vectorised over the
    batch: Total3D rotation from pitch/roll, axis swap to the Depth frame.
    """
    def single(a):
        pitch, roll = a[0], a[1]
        yaw = jnp.zeros(())
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        cr, sr = jnp.cos(roll), jnp.sin(roll)
        r = jnp.array([
            [cy * cp, sy * sr - cy * cr * sp, cr * sy + cy * sp * sr],
            [sp, cp * cr, -cp * sr],
            [-cp * sy, cy * sr + cr * sy * sp, cy * cr - sy * sp * sr],
        ])
        t = jnp.array([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0], [-1.0, 0.0, 0.0]])
        r = t @ r.T
        r = r[:, jnp.array([2, 0, 1])]
        r = r.at[2].multiply(-1.0)
        ext = jnp.zeros((4, 4)).at[:3, :3].set(r).at[3, 3].set(1.0)
        return ext

    return jax.vmap(single)(angles)
