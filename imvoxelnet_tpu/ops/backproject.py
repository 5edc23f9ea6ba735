"""Image-to-voxel backprojection (the ImVoxelNet core op), TPU-native.

Reference semantics (``mmdet3d/models/detectors/imvoxelnet.py:132-160``):
every voxel center is projected into every view with a ``(3, 4)`` projection
matrix, sampled with *nearest* (round) gather from the stride-4 feature map,
masked by image bounds and positive depth, then mean-pooled over the views
that see it.  The reference runs a python loop over views with boolean-mask
scatter; here the whole thing is a single fused XLA computation: a
``lax.scan`` over the (static) view axis accumulating ``(P, C)`` feature sums
and ``(P,)`` view counts, so peak memory is O(P*C) regardless of the number of
views (ScanNet tests with 50 views — ``configs/imvoxelnet/imvoxelnet_scannet.py:66``).

Layouts are channel-last: features ``(V, Hf, Wf, C)``, volume ``(nx, ny, nz, C)``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _scan_unroll(v: int) -> int:
    """Unroll factor for the view-accumulation scans (read at trace time).

    Measured NEGATIVE result (round 5, ScanNet v1 50-view b1 forward on
    hardware): the trace shows 19.15 ms/step of ``while`` self time, but
    ``lax.scan(unroll=u)`` makes the step *slower*, monotonically in u —
    84.5 ms/batch at u=1, 89.7 at u=10, 91.7 fully unrolled.  The while
    "self time" is evidently covered by the loop's own pipelining (xs
    slice prefetch overlapping the gather bodies), which unrolling breaks.
    Default stays 1; ``IMVOXELNET_TPU_BP_UNROLL`` re-runs the experiment
    (0 = full unroll).  docs/performance.md round-5 ScanNet section.
    """
    env = os.environ.get('IMVOXELNET_TPU_BP_UNROLL', '')
    if env:
        u = int(env)
        return v if u == 0 else min(u, v)
    return 1


def get_points(n_voxels, voxel_size, origin):
    """World coordinates of voxel centers, ``(nx, ny, nz, 3)``.

    Parity: ``get_points`` (``imvoxelnet.py:132-141``):
    ``points = idx * voxel_size + origin - n_voxels / 2 * voxel_size``.

    Args:
      n_voxels: static ``(3,)`` ints.
      voxel_size: ``(3,)`` array or tuple of floats.
      origin: ``(3,)`` array (may be traced — it is data-dependent).
    """
    nx, ny, nz = (int(v) for v in n_voxels)
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 2)
    idx = jnp.stack([ix, iy, iz], axis=-1)
    new_origin = origin - jnp.asarray([nx, ny, nz], jnp.float32) / 2.0 * voxel_size
    return idx * voxel_size + new_origin


def project_points(points, projection):
    """Project ``(P, 3)`` world points with a ``(3, 4)`` matrix.

    Returns nearest-pixel integer coords ``x, y (P,) int32`` and depth ``z``.
    """
    uvw = points @ projection[:, :3].T + projection[:, 3]
    x = jnp.round(uvw[:, 0] / uvw[:, 2]).astype(jnp.int32)
    y = jnp.round(uvw[:, 1] / uvw[:, 2]).astype(jnp.int32)
    return x, y, uvw[:, 2]


def backproject_sum_count(features, points, projections, valid_hw=None,
                          axis_name=None):
    """Masked feature sums + view counts (no mean) — the local body of both
    the single-chip path and the view-sharded ``psum`` path.

    ``axis_name``: when running inside ``shard_map`` with the view axis
    sharded, the scan carry must be marked varying over that axis.
    """
    v, hf, wf, c = features.shape
    if valid_hw is None:
        valid_hw = jnp.array([hf, wf], jnp.int32)
    flat_feats = features.reshape(v, hf * wf, c)

    def one_view(carry, view):
        acc, cnt = carry
        feats, proj = view
        x, y, z = project_points(points, proj)
        valid = ((x >= 0) & (y >= 0) & (x < valid_hw[1]) & (y < valid_hw[0])
                 & (z > 0))
        flat_idx = jnp.clip(y, 0, hf - 1) * wf + jnp.clip(x, 0, wf - 1)
        gathered = jnp.take(feats, flat_idx, axis=0, mode='clip')
        gathered = jnp.where(valid[:, None], gathered, 0.0)
        return (acc + gathered, cnt + valid.astype(acc.dtype)), None

    init = (jnp.zeros((points.shape[0], c), features.dtype),
            jnp.zeros((points.shape[0],), features.dtype))
    if axis_name is not None:
        init = jax.lax.pcast(init, (axis_name,), to='varying')
    (acc, cnt), _ = jax.lax.scan(one_view, init, (flat_feats, projections),
                                 unroll=_scan_unroll(v))
    return acc, cnt


def mean_pool_from_sums(acc, cnt, n_views=None):
    """Mean over seen views, zero where unseen (``imvoxelnet.py:70-74``).

    ``n_views``: pass the static view count; for a single view the masked
    sums already *are* the means (cnt is 0/1 and acc is zeroed where
    invalid), so the division and re-masking are skipped — they otherwise
    cost real HBM bandwidth fused into the first 3D-neck convolution.
    """
    seen = cnt > 0
    if n_views == 1:
        return acc, seen
    volume = jnp.where(seen[..., None], acc / jnp.maximum(cnt[..., None], 1.0),
                       0.0)
    return volume, seen


def backproject_view_sharded(features, points, projections, valid_hw,
                             axis_name: str):
    """View-parallel backprojection: each mesh shard along ``axis_name``
    backprojects its local views, then the (sum, count) pair is ``psum``-ed —
    mathematically identical to the reference's multi-view mean
    (``imvoxelnet.py:70-72``) and the sequence-parallel analog SURVEY.md §5
    describes for the 50-view ScanNet test.  Call inside ``shard_map`` with
    the view axis of ``features``/``projections`` sharded over ``axis_name``.
    """
    acc, cnt = backproject_sum_count(features, points, projections, valid_hw,
                                     axis_name=axis_name)
    acc = jax.lax.psum(acc, axis_name)
    cnt = jax.lax.psum(cnt, axis_name)
    return mean_pool_from_sums(acc, cnt)


def backproject_batch(features, points, projections, valid_hw,
                      axis_name=None):
    """Whole-batch backprojection with a single voxel-major gather per view.

    Functionally identical to ``vmap(backproject)`` over the batch, but the
    gather emits rows in ``(voxel, batch)`` order so its output is *already*
    in the physical layout the downstream NDHWC 3D convolutions want
    (minor-to-major ``C, B, z, y, x``) — profiling showed the batch-major
    vmap form spent ~5 ms/batch re-laying-out the 658 MB volume
    (``reshape.2940`` in the KITTI b8 trace).

    Args:
      features: ``(B, V, Hf, Wf, C)``.
      points: ``(B, P, 3)`` per-sample voxel centers.
      projections: ``(B, V, 3, 4)``.
      valid_hw: ``(B, 2)`` int ``(h, w)`` valid feature extents.
      axis_name: set when running inside ``shard_map`` with the view axis
        sharded (the scan carry must be marked varying over that axis);
        sums/counts then cover only the LOCAL views — ``psum`` outside.

    Returns:
      acc: ``(P, B, C)`` per-voxel feature sums over valid views.
      cnt: ``(P, B)`` number of views seeing each voxel.
    """
    b, v, hf, wf, c = features.shape
    p = points.shape[1]

    def view_indices(points_s, proj_s, hw_s):
        x, y, z = project_points(points_s, proj_s)
        valid = ((x >= 0) & (y >= 0) & (x < hw_s[1]) & (y < hw_s[0])
                 & (z > 0))
        idx = jnp.clip(y, 0, hf - 1) * wf + jnp.clip(x, 0, wf - 1)
        return idx, valid

    # (B, V, P) indices into each view's (Hf*Wf) table + validity
    idx, valid = jax.vmap(
        jax.vmap(view_indices, in_axes=(None, 0, None)),
        in_axes=(0, 0, 0))(points, projections, valid_hw)

    # voxel-major, batch-minor flat indices into the (B*Hf*Wf) joint table
    offs = (jnp.arange(b, dtype=idx.dtype) * (hf * wf))[None, :]

    def one_view(carry, view):
        """Gather one view's contribution.

        Masking rides the *index*, not the gathered values: invalid voxels
        gather the appended all-zero row, so no ``(P*B, C)`` boolean mask
        exists.  With the old ``jnp.where(vmask[:, None], ...)`` form XLA
        hoisted the channel-broadcast mask out of the view loop as a
        materialised ``pred[V, P*B, C]`` operand — 56 MB of the nuScenes
        while-loop's 442 MB traffic (round-4 trace, fusion args of
        ``while.6``).
        """
        acc, cnt = carry
        feats_v, idx_v, valid_v = view          # (B,Hf,Wf,C), (B,P), (B,P)
        vmask = valid_v.T.reshape(-1)           # (P*B,)
        flat = jnp.where(vmask, (idx_v.T + offs).reshape(-1), b * hf * wf)
        table = jnp.concatenate(
            [feats_v.reshape(b * hf * wf, c),
             jnp.zeros((1, c), feats_v.dtype)])
        gathered = jnp.take(table, flat, axis=0, mode='clip')
        return (acc + gathered, cnt + vmask.astype(acc.dtype)), None

    init = (jnp.zeros((p * b, c), features.dtype),
            jnp.zeros((p * b,), features.dtype))
    if axis_name is not None:
        init = jax.lax.pcast(init, (axis_name,), to='varying')
    xs = (jnp.swapaxes(features, 0, 1), jnp.swapaxes(idx, 0, 1),
          jnp.swapaxes(valid, 0, 1))
    if v <= 8 and axis_name is None:
        # Unrolled: the scan's while loop costs real device time in carry
        # copies and badly-laid-out xs slicing (nuScenes b1: 121 ms/step of
        # while self-time on a 1.17M-voxel carry — round-4 trace).  For the
        # static handful of views every config has (1-6; ScanNet's 50-view
        # TEST path uses backproject(), not this batch variant), a Python
        # loop lets XLA fuse each view's gather+add with no loop machinery.
        carry = init
        for i in range(v):
            carry, _ = one_view(carry, jax.tree_util.tree_map(
                lambda x: x[i], xs))
        acc, cnt = carry
    else:
        # chunk-unrolled for the same reason as backproject_sum_count (the
        # ScanNet v=20 train path lands here)
        (acc, cnt), _ = jax.lax.scan(one_view, init, xs,
                                     unroll=_scan_unroll(v))
    return acc.reshape(p, b, c), cnt.reshape(p, b)


def backproject_onehot(features, points, projections, valid_hw=None,
                       block: int = 1024):
    """Backprojection as one-hot x feature matmuls (MXU formulation).

    The nearest-pixel gather ``out[p] = feat[idx[p]]`` is algebraically
    ``onehot(idx[p], Hf*Wf) @ feat`` — an MXU matmul instead of a VPU gather.
    Voxel rows are processed in ``block``-sized tiles (scan) so the one-hot
    never materialises at full ``(P, Hf*Wf)`` size.

    Cost model (why this is an *experiment*, not the default): the matmul
    spends ``P * Hf*Wf * C`` MACs to move ``P * C`` values — a factor Hf*Wf
    (~19.2k indoor) more FLOPs than the gather moves bytes.  Even at full MXU
    utilisation that is ~2 TFLOP per indoor batch-8 (~10 ms) versus ~2 ms of
    gather traffic, plus the VPU cost of building the one-hots.  Measured
    numbers live in docs/performance.md (VERDICT round-1 item 10).

    Same contract as ``backproject``: returns (volume (P, C), seen (P,)).
    """
    v, hf, wf, c = features.shape
    p = points.shape[0]
    if valid_hw is None:
        valid_hw = jnp.array([hf, wf], jnp.int32)
    hw = hf * wf
    p_pad = -(-p // block) * block
    pts = jnp.zeros((p_pad, 3), jnp.float32).at[:p].set(points)
    flat_feats = features.reshape(v, hw, c).astype(jnp.bfloat16)

    def one_view(carry, view):
        acc, cnt = carry
        feats, proj = view
        x, y, z = project_points(pts, proj)
        valid = ((x >= 0) & (y >= 0) & (x < valid_hw[1]) & (y < valid_hw[0])
                 & (z > 0))
        idx = jnp.clip(y, 0, hf - 1) * wf + jnp.clip(x, 0, wf - 1)
        idx = jnp.where(valid, idx, -1)          # -1 -> all-zero one-hot row

        def one_block(_, blk):
            bidx, = blk
            onehot = (bidx[:, None] ==
                      jnp.arange(hw, dtype=bidx.dtype)[None, :])
            g = jax.lax.dot(onehot.astype(jnp.bfloat16), feats,
                            preferred_element_type=jnp.float32)
            return None, g

        _, gathered = jax.lax.scan(
            one_block, None, (idx.reshape(-1, block),))
        gathered = gathered.reshape(p_pad, c)
        return (acc + gathered, cnt + valid.astype(acc.dtype)), None

    init = (jnp.zeros((p_pad, c), jnp.float32),
            jnp.zeros((p_pad,), jnp.float32))
    (acc, cnt), _ = jax.lax.scan(one_view, init, (flat_feats, projections))
    acc = acc[:p].astype(features.dtype)
    cnt = cnt[:p].astype(features.dtype)
    return mean_pool_from_sums(acc, cnt, n_views=v)


def backproject(features, points, projections, valid_hw=None):
    """Backproject + multi-view mean-pool, fused.

    Args:
      features: ``(V, Hf, Wf, C)`` stride-4 2D feature maps (may be padded —
        pass the actual valid extent via ``valid_hw``; masking replaces the
        reference's ``feature[:, :, :h, :w]`` slice at ``imvoxelnet.py:69``).
      points: ``(P, 3)`` voxel centers (flattened grid, x-major like the
        reference's ``meshgrid`` ordering).
      projections: ``(V, 3, 4)`` per-view ``K @ E[:3]``.
      valid_hw: optional ``(2,)`` int array ``(h, w)`` of valid feature extent;
        defaults to the full feature shape.

    Returns:
      volume: ``(P, C)`` mean-pooled features (zero where no view sees the voxel).
      valid: ``(P,)`` bool, voxel seen by >= 1 view.
    """
    acc, cnt = backproject_sum_count(features, points, projections, valid_hw)
    return mean_pool_from_sums(acc, cnt, n_views=features.shape[0])


@functools.partial(jax.jit, static_argnames=('n_voxels',))
def backproject_volume(features, projections, origin, n_voxels, voxel_size,
                       valid_hw=None):
    """End-to-end: voxel grid -> projection -> gather -> mean pool.

    Returns ``volume (nx, ny, nz, C)`` and ``valid (nx, ny, nz)``, the
    channel-last analog of ``extract_feat``'s per-sample body
    (``imvoxelnet.py:62-74``).
    """
    nx, ny, nz = (int(x) for x in n_voxels)
    points = get_points(n_voxels, voxel_size, origin).reshape(-1, 3)
    volume, valid = backproject(features, points, projections, valid_hw)
    c = features.shape[-1]
    return volume.reshape(nx, ny, nz, c), valid.reshape(nx, ny, nz)


def compute_projection(intrinsic, extrinsics, ratio):
    """Per-view projection matrices ``K_scaled @ E[:3]``.

    Parity: ``ImVoxelNet._compute_projection`` (``imvoxelnet.py:114-129``):
    the first two intrinsic rows are divided by
    ``ratio = ori_h / (img_h / stride)``.

    Args:
      intrinsic: ``(3, 3)`` (or ``(4, 4)``, top-left used).
      extrinsics: ``(V, 4, 4)``.
      ratio: scalar.
    Returns:
      ``(V, 3, 4)``.
    """
    k = intrinsic[:3, :3]
    scale = jnp.array([1.0 / ratio, 1.0 / ratio, 1.0], jnp.float32)
    k = k * scale[:, None]
    return jnp.einsum('ij,vjk->vik', k, extrinsics[:, :3, :])
