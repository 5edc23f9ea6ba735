"""Microbenchmark: Pallas rotated-clip kernel vs the XLA clip on TPU.

Measures ``rect_intersection_area`` on the pair counts that matter in
production: the truncated-NMS class matrix (256x256), the KITTI/indoor NMS
sizes, and the exact-NMS matrix (3000x3000 = 9M pairs).  Timing rule per
docs/performance.md: every iteration ends with a d2h fetch of a small
reduction (the axon backend's ``block_until_ready`` is unreliable).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--warmup', type=int, default=3)
    parser.add_argument('--tile', type=int, default=512)
    parser.add_argument('--sizes', default='256,1000,3000',
                        help='comma-separated N for NxN pair matrices')
    parser.add_argument('--skip-xla', action='store_true')
    parser.add_argument('--nms', action='store_true',
                        help='benchmark multiclass_nms_3d_exact end-to-end '
                             '(3000 candidates, score_thr=0) instead of the '
                             'raw clip')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

    from imvoxelnet_tpu.ops import boxes as box_ops
    from imvoxelnet_tpu.ops import iou as iou_ops
    from imvoxelnet_tpu.ops.iou_pallas import rect_intersection_area_pallas

    rng = np.random.RandomState(0)

    def rects(n):
        xy = rng.uniform(-40, 40, (n, 2))
        wh = rng.uniform(0.5, 5.0, (n, 2))
        r = rng.uniform(-np.pi, np.pi, (n, 1))
        return jnp.asarray(np.concatenate([xy, wh, r], 1), jnp.float32)

    if args.nms:
        from imvoxelnet_tpu.ops import nms as nms_ops
        n, n_cls = 3000, 10
        boxes = jnp.concatenate(
            [rects(n)[:, :2],
             jnp.zeros((n, 1)), rects(n)[:, 2:4],
             jnp.ones((n, 1)), rects(n)[:, 4:5]], axis=1)
        bev = jnp.concatenate([boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]],
                              axis=1)
        scores = jnp.asarray(rng.uniform(0, 1, (n, n_cls)), jnp.float32)
        valid = jnp.ones((n,), bool)

        def run():
            out = nms_ops.multiclass_nms_3d_exact(
                boxes, bev, scores, valid,
                score_thr=0.0, max_num=1000, iou_thr=0.25)
            return float(np.asarray(out['scores'][0]))

        for _ in range(args.warmup):
            run()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = run()
        dt = (time.perf_counter() - t0) / args.iters
        print(f'exact NMS {n} cands x {n_cls} cls: {dt*1e3:.1f} ms '
              f'(top score {s:.4f})')
        return

    @jax.jit
    def xla_pairwise(c1, c2):
        return jnp.sum(
            iou_ops._rect_intersection_area_jnp(c1[:, None], c2[None, :]))

    def make_pallas(compaction):
        def pallas_pairwise(c1, c2):
            return jnp.sum(rect_intersection_area_pallas(
                c1[:, None], c2[None, :], tile=args.tile, interpret=False,
                compaction=compaction))
        return jax.jit(pallas_pairwise)

    impls = [('xla', xla_pairwise),
             ('pallas/scatter', make_pallas('scatter')),
             ('pallas/shift', make_pallas('shift'))]
    if args.skip_xla:
        impls = impls[1:]
    for n in [int(s) for s in args.sizes.split(',')]:
        m = n
        c1 = box_ops.bev_corners(rects(n))
        c2 = box_ops.bev_corners(rects(m))
        pairs = n * m
        for name, fn in impls:
            try:
                for _ in range(args.warmup):
                    float(np.asarray(fn(c1, c2)))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = float(np.asarray(fn(c1, c2)))
                dt = (time.perf_counter() - t0) / args.iters
                print(f'{name:7s} {n}x{m} ({pairs/1e6:.2f}M pairs): '
                      f'{dt*1e3:8.2f} ms  ({dt/pairs*1e9:6.1f} ns/pair)  '
                      f'sum={out:.3f}')
            except Exception as e:  # surface Mosaic errors per-size
                print(f'{name:7s} {n}x{m}: FAILED {type(e).__name__}: '
                      f'{str(e)[:300]}')


if __name__ == '__main__':
    main()
