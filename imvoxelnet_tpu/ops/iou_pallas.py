"""Pallas TPU kernel for the rotated-rect intersection clip.

The sort-free Sutherland-Hodgman clip in ``ops/iou.py:rect_intersection_area``
is the hot core of rotated NMS and the indoor eval protocol (the TPU-native
replacement for the reference's CUDA vertex sort,
``mmdet3d/ops/rotated_iou/box_intersection_2d.py`` + ``sort_v``, and the
bitmask-NMS overlap kernel ``mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-345``).
The XLA version is VPU-bound but materialises its ~40 per-edge intermediates
through HBM between fusions; this kernel runs the identical algorithm with the
whole working set — the ``(8 slots, TILE pairs)`` polygon arrays and every
edge-clip temporary — resident in VMEM/vregs, touching HBM once for the 16
input corner rows and once for the output area row.

Layout: structure-of-arrays, pair axis on lanes (the same SoA lesson as the
XLA path — see ``docs/performance.md``): inputs are ``(4, P)`` corner-x /
corner-y planes for each rect, the grid tiles P, and each grid step clips its
``TILE``-pair slab entirely in registers.  No gathers, no dynamic slices —
every op is elementwise / sublane-reduce / static-slice, which Mosaic compiles
today (unlike the gather-based backprojection kernel, ``backproject_pallas.py``
STATUS).

Numerics are bit-identical to the XLA path in fp32: same operations in the
same order.  The kernel is not differentiated directly — ``ops/iou.py`` wraps
it in a ``custom_vjp`` whose backward differentiates the jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 8  # rect ∩ rect has at most 8 vertices
# Hardware sweep (v5e via axon, docs/performance.md "Pallas rotated clip"):
# 512 -> 40.6, 1024 -> 14-19, 2048 -> 7.4, 4096 -> 7.6 ns/pair at 9M pairs;
# per-tile fixed cost dominates below 2048, VMEM residency plateaus above.
_TILE = 2048


def _roll_up(a):
    """``a[(i + 1) % n]`` along the sublane axis via static slices."""
    return jnp.concatenate([a[1:], a[0:1]], axis=0)


def _clip_kernel(c1x_ref, c1y_ref, c2x_ref, c2y_ref, out_ref, *,
                 compaction: str = 'scatter'):
    c1x = c1x_ref[:].astype(jnp.float32)  # (4, T)
    c1y = c1y_ref[:].astype(jnp.float32)
    c2x = c2x_ref[:].astype(jnp.float32)
    c2y = c2y_ref[:].astype(jnp.float32)
    t = c1x.shape[1]

    pad = jnp.zeros((_SLOTS - 4, t), jnp.float32)
    vx = jnp.concatenate([c1x, pad], axis=0)  # (8, T) polygon vertices
    vy = jnp.concatenate([c1y, pad], axis=0)
    count = jnp.full((1, t), 4, jnp.int32)

    # rect2 center fixes the inequality side independent of winding order
    cx2 = (c2x[0:1] + c2x[1:2] + c2x[2:3] + c2x[3:4]) * 0.25
    cy2 = (c2y[0:1] + c2y[1:2] + c2y[2:3] + c2y[3:4]) * 0.25
    slot = jax.lax.broadcasted_iota(jnp.int32, (_SLOTS, t), 0)

    for e in range(4):
        ax = c2x[e : e + 1]
        ay = c2y[e : e + 1]
        nxt = (e + 1) % 4
        abx = c2x[nxt : nxt + 1] - ax
        aby = c2y[nxt : nxt + 1] - ay
        ref = abx * (cy2 - ay) - aby * (cx2 - ax)
        sign = jnp.where(ref >= 0, 1.0, -1.0)

        s_cur = (abx * (vy - ay) - aby * (vx - ax)) * sign  # (8, T)
        active = slot < count
        # next vertex: v[(i+1)] while i+1 < count else v[0]
        take_next = (slot + 1) < count
        nvx = jnp.where(take_next, _roll_up(vx), vx[0:1])
        nvy = jnp.where(take_next, _roll_up(vy), vy[0:1])
        s_nxt = jnp.where(take_next, _roll_up(s_cur), s_cur[0:1])

        inside_cur = s_cur >= 0
        inside_nxt = s_nxt >= 0
        emit_cur = active & inside_cur
        emit_int = active & (inside_cur != inside_nxt)

        denom = s_cur - s_nxt
        tt = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        ix = vx + tt * (nvx - vx)
        iy = vy + tt * (nvy - vy)

        if compaction == 'shift':
            # Compaction as a 4-stage binary shift network instead of the
            # 8x8 masked-sum scatter.  Candidates interleave in cyclic order
            # (cur_0, int_0, cur_1, int_1, ...) into 16 sublanes; each valid
            # candidate must move UP by disp = #invalid slots before it.
            # Routing bit-by-bit LSB->MSB (shifts 1,2,4,8) is conflict-free
            # for this monotone pack — proven exhaustively over all 2^16
            # validity patterns (MSB-first collides, e.g. pattern
            # 0000001000000010).  ~40 two-vreg ops replace ~450 one-vreg
            # ops; packed slots are bit-identical, slots >= count hold stale
            # values instead of zeros (every consumer is masked by `count`).
            # Hardware comparison: tools/bench_iou_kernel.py sweeps both.
            rows_x, rows_y, rows_v = [], [], []
            for k in range(_SLOTS):
                rows_x += [vx[k : k + 1], ix[k : k + 1]]
                rows_y += [vy[k : k + 1], iy[k : k + 1]]
                rows_v += [emit_cur[k : k + 1], emit_int[k : k + 1]]
            cx = jnp.concatenate(rows_x, axis=0)       # (16, T)
            cy = jnp.concatenate(rows_y, axis=0)
            cv = jnp.concatenate(rows_v, axis=0)
            inv = 1 - cv.astype(jnp.int32)
            cum = inv  # inclusive cumsum over 16 sublanes, 4 log-steps
            for s in (1, 2, 4, 8):
                cum = cum + jnp.concatenate(
                    [jnp.zeros((s, t), jnp.int32), cum[:-s]], axis=0)
            disp = cum - inv  # exclusive: #invalid strictly before the slot
            count = 2 * _SLOTS - cum[-1:]  # total valid = 16 - total invalid
            for s in (1, 2, 4, 8):
                move = ((disp & s) != 0) & cv
                # arrival[k] <- element at k+s moves; bottom s rows get no
                # arrival, so the wrapped filler rows are never selected
                arr = jnp.concatenate(
                    [move[s:], jnp.zeros((s, t), bool)], axis=0)

                def up(a, s=s):
                    return jnp.concatenate([a[s:], a[:s]], axis=0)

                cx = jnp.where(arr, up(cx), cx)
                cy = jnp.where(arr, up(cy), cy)
                disp = jnp.where(arr, up(disp), disp)
                cv = arr | (cv & ~move)
            vx = cx[:_SLOTS]
            vy = cy[:_SLOTS]
        else:
            n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
            # exclusive cumsum over the 8 slots, hand-unrolled (static adds)
            run = jnp.zeros((1, t), jnp.int32)
            pos0_rows = []
            for k in range(_SLOTS):
                pos0_rows.append(run)
                run = run + n_emit[k : k + 1]
            pos0 = jnp.concatenate(pos0_rows, axis=0)
            pos1 = pos0 + emit_cur.astype(jnp.int32)

            # compaction scatter as a static 8x8 unroll of masked sublane sums
            m0 = emit_cur.astype(jnp.float32)
            m1 = emit_int.astype(jnp.float32)
            sx = m0 * vx
            sy = m0 * vy
            jx = m1 * ix
            jy = m1 * iy
            rows_x = []
            rows_y = []
            for k in range(_SLOTS):
                w0 = pos0 == k
                w1 = pos1 == k
                rows_x.append(jnp.sum(
                    jnp.where(w0, sx, 0.0) + jnp.where(w1, jx, 0.0),
                    axis=0, keepdims=True))
                rows_y.append(jnp.sum(
                    jnp.where(w0, sy, 0.0) + jnp.where(w1, jy, 0.0),
                    axis=0, keepdims=True))
            vx = jnp.concatenate(rows_x, axis=0)
            vy = jnp.concatenate(rows_y, axis=0)
            count = run

    # shoelace: pad inactive slots with the first vertex to close the polygon
    active = slot < count
    cvx = jnp.where(active, vx, vx[0:1])
    cvy = jnp.where(active, vy, vy[0:1])
    nvx = _roll_up(cvx)
    nvy = _roll_up(cvy)
    area = 0.5 * jnp.abs(
        jnp.sum(cvx * nvy - cvy * nvx, axis=0, keepdims=True))
    area = jnp.where(count > 2, area, 0.0)  # (1, T)
    out_ref[:] = jnp.broadcast_to(area, (_SLOTS, t))


@functools.partial(jax.jit, static_argnames=('tile', 'interpret', 'compaction'))
def _pallas_area_flat(c1x, c1y, c2x, c2y, *, tile: int, interpret: bool,
                      compaction: str = 'scatter'):
    p = c1x.shape[1]
    grid = p // tile
    spec_in = pl.BlockSpec((4, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_clip_kernel, compaction=compaction),
        grid=(grid,),
        in_specs=[spec_in] * 4,
        out_specs=pl.BlockSpec((_SLOTS, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_SLOTS, p), jnp.float32),
        interpret=interpret,
    )(c1x, c1y, c2x, c2y)
    return out[0]


def rect_intersection_area_pallas(corners1, corners2, *, tile: int = _TILE,
                                  interpret: bool | None = None,
                                  compaction: str = 'scatter'):
    """Exact rotated-rect intersection areas, Pallas TPU kernel.

    Same contract as ``iou.rect_intersection_area``: ``(..., 4, 2)`` corner
    arrays (broadcastable batch dims) -> ``(...,)`` fp32 areas.
    ``interpret=None`` auto-selects the Pallas interpreter off-TPU so the
    kernel stays testable on the CPU mesh.  ``compaction`` picks the
    per-edge vertex pack: ``'scatter'`` (the hardware-validated 8x8
    masked-sum unroll) or ``'shift'`` (the 4-stage binary shift network —
    bit-identical areas, ~10x fewer compaction ops; default flips once the
    hardware microbench confirms it, tools/bench_iou_kernel.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    batch = jnp.broadcast_shapes(corners1.shape[:-2], corners2.shape[:-2])
    c1 = jnp.broadcast_to(corners1, batch + (4, 2)).astype(jnp.float32)
    c2 = jnp.broadcast_to(corners2, batch + (4, 2)).astype(jnp.float32)
    p = int(np.prod(batch)) if batch else 1
    c1 = c1.reshape(p, 4, 2)
    c2 = c2.reshape(p, 4, 2)

    pp = -(-p // tile) * tile
    padw = ((0, 0), (0, pp - p))
    c1x = jnp.pad(c1[:, :, 0].T, padw)  # (4, pp)
    c1y = jnp.pad(c1[:, :, 1].T, padw)
    c2x = jnp.pad(c2[:, :, 0].T, padw)
    c2y = jnp.pad(c2[:, :, 1].T, padw)

    area = _pallas_area_flat(c1x, c1y, c2x, c2y, tile=tile,
                             interpret=interpret, compaction=compaction)
    return area[:p].reshape(batch)
