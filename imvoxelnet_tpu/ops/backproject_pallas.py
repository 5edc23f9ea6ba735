"""Fused Pallas TPU kernel for image-to-voxel backprojection.

Fuses the whole per-sample hot path of ``extract_feat``
(``mmdet3d/models/detectors/imvoxelnet.py:144-160`` + mean pool :70-74) into
one kernel: per (voxel-tile, channel-tile, view) grid step, project the tile's
voxel centers with the view's ``(3, 4)`` matrix, nearest-gather the view's
stride-4 feature map slice (resident in VMEM), and accumulate the masked sum
and view count — the ``(V, P, C)`` intermediate the reference materialises
never exists and HBM traffic is one read of the features per channel tile +
one write of the volume.

Grid: ``(p_tiles, c_tiles, V)`` with the view axis innermost (output blocks
revisited across ``v`` — the standard accumulate-over-K pattern); the view
count accumulates only on the first channel tile.

STATUS — Mosaic gather limitation (retested round 2, 2026-08, current
toolchain): the kernel is exact in interpret mode (tested against the XLA
reference), but the compiled path still hits ``Not implemented: Multiple
source vregs along gather dimension`` — the emitted ``tpu.dynamic_gather`` on
a ``vector<2048x64xf32>`` table needs 256 source vregs along the gather dim
and Mosaic supports one (a single-vreg 8x128 shuffle).  We already satisfy
its other constraints: same-shape output via ``tile == Hf*Wf``, matching
32-bit index/value widths, no mask transposes via the column orientation.

Both workaround families were evaluated on hardware (docs/performance.md
"Round-2 experiments"):
  * per-vreg serialized gather — a (Hf*Wf/8)-step select cascade per output
    tile (~3.8k sequential vector ops for the KITTI table); ruled out by
    arithmetic, it is orders of magnitude more work than the gather moves.
  * one-hot x feature matmul (``backproject.backproject_onehot``) — measured
    4.24 ms vs 3.63 ms for XLA's gather on the indoor `_fast` shapes; the
    P*HW one-hot construction on the VPU outweighs the MXU's rate advantage.

XLA's native gather therefore remains the TPU-native implementation of this
access pattern (9.5 ms inside the KITTI b8 forward, 6% of the batch); the
production path is ``ops/backproject.py``.  This kernel is kept as the fused
formulation that becomes compilable when Mosaic gains multi-vreg gathers —
re-test on each jax/libtpu bump.

Round-3 close-out of the remaining design point (sub-table tiling): split
the feature table into sub-tables small enough for a single-source-vreg
gather (<= 128-256 pixels) and select among them.  The KITTI table
(96*320 = 30720 px) needs >= 120 sub-tables; every voxel tile must gather
from EACH sub-table and select by index range, so per 2048-voxel x 64-ch
tile that is ~120 x ~2 vreg-ops x 16 vregs ~ 3.8k sequential vector ops —
~10 ms over the 5.1M-row KITTI batch at 1 op/cycle, i.e. at best *parity*
with XLA's 9.5 ms gather before any select/bookkeeping overhead, with
strictly worse scaling in table size.  Together with the measured one-hot
(4.24 vs 3.63 ms) and per-vreg-serialization negatives above, this closes
the workaround space: no Pallas formulation beats XLA's gather without
native multi-vreg ``tpu.dynamic_gather``.  The BACKWARD (scatter-add,
76.9 ms in the train step) is blocked on the same primitive — see
docs/performance.md round-3 train attribution and ``tools/bench_scatter.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hw_ref, proj_ref, points_ref, feat_ref, acc_ref, cnt_ref):
    c_idx = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((v == 0) & (c_idx == 0))
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    p = [[proj_ref[0, r, c] for c in range(4)] for r in range(3)]
    # column orientation (T, 1) throughout — Mosaic cannot transpose masks
    x = points_ref[:, 0:1]          # (T, 1)
    y = points_ref[:, 1:2]
    z = points_ref[:, 2:3]
    u = p[0][0] * x + p[0][1] * y + p[0][2] * z + p[0][3]
    vv = p[1][0] * x + p[1][1] * y + p[1][2] * z + p[1][3]
    w = p[2][0] * x + p[2][1] * y + p[2][2] * z + p[2][3]

    w_safe = jnp.where(w != 0, w, 1.0)
    xi = jnp.round(u / w_safe).astype(jnp.int32)
    yi = jnp.round(vv / w_safe).astype(jnp.int32)

    hf = hw_ref[0]
    wf = hw_ref[1]
    valid = ((xi >= 0) & (yi >= 0) & (xi < hw_ref[3]) & (yi < hw_ref[2])
             & (w > 0))                       # (T, 1)
    flat = (jnp.clip(yi, 0, hf - 1) * wf
            + jnp.clip(xi, 0, wf - 1))        # (T, 1), T == Hf*Wf

    # same-shape gather: out[i, j] = feat[idx[i, j], j].  Mosaic's
    # tpu.dynamic_gather requires index/value bitwidths to match, so the bf16
    # block is widened to f32 for the gather.
    feat = feat_ref[0].astype(jnp.float32)     # (T, C_tile)
    idx2d = jnp.broadcast_to(flat, feat.shape)
    gathered = jnp.take_along_axis(feat, idx2d, axis=0)
    gathered = jnp.where(valid, gathered, 0.0)

    acc_ref[:] += gathered.astype(acc_ref.dtype)

    @pl.when(c_idx == 0)
    def _():
        cnt_ref[:] += valid.astype(cnt_ref.dtype)


@functools.partial(jax.jit, static_argnames=('c_tile',))
def backproject_pallas(features, points, projections, valid_hw=None,
                       c_tile: int = None):
    """Fused backprojection.  Same contract as ``backproject.backproject``.

    The feature path runs in bfloat16 inside the kernel (the production
    compute dtype): Mosaic's VMEM budget (~16 MB) holds the double-buffered
    ``(Hf*Wf, C)`` feature block plus the accumulator only at 2 bytes/elem.
    The multi-view mean therefore carries bf16 precision — numerically
    equivalent to running the whole conv path in bf16.

    Args:
      features: ``(V, Hf, Wf, C)``; cast to bf16 internally.
      points: ``(P, 3)`` voxel centers (padded internally to a multiple of
        ``Hf * Wf``).
      projections: ``(V, 3, 4)``.
      valid_hw: optional ``(2,)`` int32 valid feature extent.
      c_tile: channel block (must be 128-divisible or the full C); default
        full C when C <= 128 else 128.

    Returns:
      volume ``(P, C)``, seen ``(P,)`` bool (volume in ``features.dtype``).
    """
    v, hf, wf, c = features.shape
    p = points.shape[0]
    tile = hf * wf
    if c_tile is None:
        c_tile = c if c <= 128 else 128
    c_tile = min(c_tile, c)
    assert c % c_tile == 0, (c, c_tile)
    out_dtype = features.dtype
    features = features.astype(jnp.bfloat16)
    if valid_hw is None:
        valid_hw = jnp.array([hf, wf], jnp.int32)
    hw_params = jnp.concatenate(
        [jnp.array([hf, wf], jnp.int32), jnp.asarray(valid_hw, jnp.int32)])

    p_pad = -(-p // tile) * tile
    pts = jnp.zeros((p_pad, 3), jnp.float32).at[:p].set(points)
    feats_flat = features.reshape(v, tile, c)

    grid = (p_pad // tile, c // c_tile, v)
    acc, cnt = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # hw params
            pl.BlockSpec((1, 3, 4), lambda i, j, k: (k, 0, 0),
                         memory_space=pltpu.SMEM),                  # projection
            pl.BlockSpec((tile, 3), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),                  # points
            pl.BlockSpec((1, tile, c_tile), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),                  # features
        ],
        out_specs=[
            pl.BlockSpec((tile, c_tile), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(hw_params, projections, pts, feats_flat)

    cnt = cnt[:p, 0]
    acc = acc[:p].astype(jnp.float32)
    seen = cnt > 0
    volume = jnp.where(seen[:, None], acc / jnp.maximum(cnt[:, None], 1.0), 0.0)
    return volume.astype(out_dtype), seen
