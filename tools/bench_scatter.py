"""Microbenchmark: formulations of the backprojection-gather BACKWARD.

The KITTI b8 train trace shows the gather's scatter-add backward
(``fusion.18``: 5.14M rows x 64ch bf16 into a (245760, 64) table) costing
76.9 ms — 8.6 GB/s effective, 13% of the train step.  This tool measures
candidate formulations standalone on the TPU (d2h-fetch timing, see
axon-tpu-quirks):

  baseline     .at[idx].add(data) bf16         (what autodiff emits today)
  f32          same in f32
  vmap8        per-sample scatter vmapped over B
  sorted       same scatter but with pre-sorted indices (locality probe)
  seg_sorted   segment_sum(indices_are_sorted=True) on pre-sorted rows
  cumsum       sorted rows -> f32 cumulative sum -> boundary differences
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])

    B, P, HW, C = 8, 642816, 30720, 64
    HF, WF = 96, 320
    N = B * P
    rng = np.random.RandomState(0)
    # REAL index pattern: the KITTI voxel grid projected with a plausible
    # stride-4 camera (fx/4 ~ 177, image center), exactly the map whose
    # backward the train step executes.  Locality of this map dominates
    # scatter cost — synthetic ramps measured 3.7x slower than the in-graph
    # op, so realistic indices are required for transferable numbers.
    from imvoxelnet_tpu.ops.backproject import get_points
    import jax.numpy as _jnp
    pts = np.asarray(get_points((216, 248, 12), (0.64, 0.64, 0.33),
                                np.array([0.0, 0.0, 0.0], np.float32))
                     ).reshape(-1, 3)
    idx_all = []
    for b in range(B):
        k = np.array([[177.0, 0, 160.0 + b], [0, 177.0, 48.0],
                      [0, 0, 1.0]], np.float32)
        e = np.eye(4, dtype=np.float32)
        # camera looks along +x of the grid: rotate axes (grid x -> cam z)
        e[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
        e[:3, 3] = [0.0, 0.8, 70.0 + b]
        proj = k @ e[:3]
        uvw = pts @ proj[:, :3].T + proj[:, 3]
        x = np.round(uvw[:, 0] / uvw[:, 2]).astype(np.int64)
        y = np.round(uvw[:, 1] / uvw[:, 2]).astype(np.int64)
        idx_all.append(np.clip(y, 0, HF - 1) * WF + np.clip(x, 0, WF - 1))
    # voxel-major, batch-minor interleave + per-sample table offset — the
    # exact joint-table layout of backproject_batch
    idx_np = np.stack(idx_all, axis=1).astype(np.int32)        # (P, B)
    joint_np = (idx_np + (np.arange(B, dtype=np.int32) * HW)[None, :]
                ).reshape(-1)
    idx_np = idx_np.reshape(-1)
    data_np = rng.randn(N, C).astype(np.float32)

    data_bf16 = jnp.asarray(data_np, jnp.bfloat16)
    data_f32 = jnp.asarray(data_np)
    joint = jnp.asarray(joint_np)

    order_np = np.argsort(joint_np, kind='stable')
    order = jnp.asarray(order_np.astype(np.int32))
    joint_sorted = jnp.asarray(joint_np[order_np])

    def timeit(name, fn, *args):
        out = fn(*args)
        s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())  # warm
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s2 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f'{name:12s} {dt:8.2f} ms   (check {s:.1f}/{s2:.3f})',
              flush=True)
        return dt

    @jax.jit
    def baseline(d, j):
        return jnp.zeros((B * HW, C), d.dtype).at[j].add(d)

    @jax.jit
    def vmap8(d, i):
        return jax.vmap(
            lambda dd, ii: jnp.zeros((HW, C), d.dtype).at[ii].add(dd)
        )(d.reshape(P, B, C).swapaxes(0, 1),
          i.reshape(P, B).swapaxes(0, 1))

    @jax.jit
    def seg_sorted(d, o, js):
        ds = jnp.take(d, o, axis=0)
        return jax.ops.segment_sum(ds, js, num_segments=B * HW,
                                   indices_are_sorted=True)

    @jax.jit
    def cumsum_diff(d, o, js):
        ds = jnp.take(d, o, axis=0).astype(jnp.float32)
        cs = jnp.cumsum(ds, axis=0)
        # last position of each segment: boundary where js changes
        seg_end = jnp.concatenate([js[1:] != js[:-1],
                                   jnp.ones((1,), bool)])
        ends = jnp.where(seg_end, size=N, fill_value=N - 1)[0]
        totals = cs[ends]                         # cumulative at segment ends
        prev = jnp.concatenate([jnp.zeros((1, C), jnp.float32),
                                totals[:-1]], axis=0)
        vals = totals - prev
        out = jnp.zeros((B * HW, C), jnp.float32).at[js[ends]].add(
            jnp.where(seg_end[ends][:, None], vals, 0.0))
        return out

    timeit('baseline16', baseline, data_bf16, joint)
    timeit('baseline32', baseline, data_f32, joint)
    timeit('vmap8', vmap8, data_bf16, jnp.asarray(idx_np))
    timeit('sorted16', baseline, data_bf16, joint_sorted)
    timeit('seg_sorted', seg_sorted, data_bf16, order, joint_sorted)
    # correctness cross-check on a small slice
    ref = np.zeros((B * HW, C), np.float64)
    np.add.at(ref, joint_np, data_np)
    got = np.asarray(baseline(data_f32, joint))
    print('f32 scatter max err', np.abs(got - ref).max())
    got2 = np.asarray(seg_sorted(data_f32, order, joint_sorted))
    print('seg_sorted max err', np.abs(got2 - ref).max())


if __name__ == '__main__':
    main()
