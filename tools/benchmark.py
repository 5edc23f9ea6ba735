"""Throughput benchmark CLI for any preset.

Parity: ``tools/benchmark.py:63-91`` (warm-up skip, synchronized timing, FPS
report) — plus a ``--trace`` option that captures a ``jax.profiler`` trace
(the reference has no tracer; SURVEY.md §5 calls this out as a gap to fix).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset', nargs='?', default='imvoxelnet_kitti')
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--warmup', type=int, default=2)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--train', action='store_true',
                        help='benchmark the training step instead of forward')
    parser.add_argument('--trace', default=None,
                        help='directory for a jax.profiler trace')
    parser.add_argument('--dump-hlo', default=None,
                        help='write the optimized HLO text of the measured '
                             'executable here (for analyze_trace --hlo)')
    parser.add_argument('--exact-nms', action='store_true',
                        help='indoor presets: pre_nms_k=0 (exact untruncated '
                             'shared-IoU-matrix NMS; docs/performance.md)')
    parser.add_argument('--view-sharded', action='store_true',
                        help='forward only: shard the view axis over all '
                             'local devices (parallel.mesh.'
                             'view_sharded_forward; on one chip this '
                             'measures the shard_map no-regression cost)')
    parser.add_argument('--override', action='append', default=None,
                        metavar='PATH=VALUE',
                        help='preset field override, e.g. '
                             'model.indoor_head.score_thr=0.1 '
                             '(repeatable; the reference --options '
                             'analog)')
    args = parser.parse_args()

    import dataclasses

    import jax
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

    from __graft_entry__ import _kitti_batch
    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict
    from imvoxelnet_tpu.parallel import train as train_lib

    preset = get_preset(args.preset)
    if args.override:
        from imvoxelnet_tpu.configs.presets import apply_overrides
        preset = apply_overrides(preset, args.override)
    cfg = dataclasses.replace(preset.model, compute_dtype=args.dtype)
    if args.exact_nms:
        if cfg.indoor_head is None:
            parser.error('--exact-nms requires an indoor-head preset')
        cfg = dataclasses.replace(
            cfg, indoor_head=dataclasses.replace(cfg.indoor_head,
                                                 pre_nms_k=0))
    model = ImVoxelNet(cfg)
    w, h = preset.data.test_size
    batch = _kitti_batch(args.batch_size, preset.data.n_images_test, h, w,
                         train=args.train)

    if args.train:
        tx = train_lib.make_optimizer(1e-4, 1e-4, 0.1, 35.0, 100)
        state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0),
                                             batch)
        step = jax.jit(train_lib.make_train_step(model, tx))

        # One metrics-fetch in flight: step N+1 depends only on the on-device
        # state, so dispatching it before fetching step N's loss is exactly
        # what a real training loop does — the d2h fetch of the *previous*
        # loss still bounds every iteration with real execution (axon's
        # block_until_ready does not).
        pending = [None]

        def run():
            nonlocal state
            state, metrics = step(state, batch)
            out = (float(np.asarray(pending[0])) if pending[0] is not None
                   else 0.0)
            pending[0] = metrics['loss']
            return out
    elif args.view_sharded:
        from imvoxelnet_tpu.parallel import mesh as mesh_lib
        vmesh = mesh_lib.make_mesh(axis_name='view')
        n_views = preset.data.n_images_test
        if n_views % vmesh.size:
            parser.error(f'n_images_test={n_views} must be divisible by the '
                         f'device count {vmesh.size}')
        # init with the unsharded model (identical param tree), apply sharded
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        model_sh = ImVoxelNet(dataclasses.replace(cfg,
                                                  view_shard_axis='view'))
        sharded_apply = mesh_lib.view_sharded_forward(model_sh, vmesh)
        predict_fn = jax.jit(
            lambda outs, batch: imvoxelnet_predict(cfg, *outs, batch))

        def forward(variables, batch):
            return predict_fn(sharded_apply(variables, batch), batch)

        pending = [None]

        def run():
            out = forward(variables, batch)
            res = (float(np.asarray(pending[0]['scores']).sum())
                   if pending[0] is not None else 0.0)
            pending[0] = out
            return res
    else:
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        @jax.jit
        def forward(variables, batch):
            outs = model.apply(variables, batch, train=False)
            return imvoxelnet_predict(cfg, *outs, batch)

        # Steady-state serving measurement (same as bench.py): keep one
        # batch in flight so host/tunnel dispatch overlaps device
        # execution; every iteration still ends with a d2h fetch of the
        # previous batch's detections.
        pending = [None]

        def run():
            out = forward(variables, batch)
            res = (float(np.asarray(pending[0]['scores']).sum())
                   if pending[0] is not None else 0.0)
            pending[0] = out
            return res

    if args.dump_hlo:
        # optimized-HLO text of the measured executable, for
        # tools/analyze_trace.py --hlo (names sourceless backward fusions
        # from their fused-computation bodies).  The AOT lower/compile hits
        # the persistent compilation cache, so this adds no real compile.
        if args.view_sharded:
            parser.error('--dump-hlo does not support --view-sharded')
        jitted = step if args.train else forward
        example = (state, batch) if args.train else (variables, batch)
        with open(args.dump_hlo, 'w') as f:
            f.write(jitted.lower(*example).compile().as_text())
        print(f'wrote optimized HLO to {args.dump_hlo}')

    for _ in range(args.warmup + 1):
        run()
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    if args.train:
        # drain the in-flight loss so the window closes on real execution
        float(np.asarray(state.step))
    else:
        float(np.asarray(pending[0]['scores']).sum())
    dt = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    sps = args.batch_size * args.iters / dt
    print(json.dumps(dict(preset=args.preset, mode='train' if args.train
                          else 'fwd', dtype=args.dtype,
                          scenes_per_sec=round(sps, 2),
                          ms_per_batch=round(dt / args.iters * 1e3, 2))))


if __name__ == '__main__':
    main()
