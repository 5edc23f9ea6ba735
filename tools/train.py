"""Training CLI — the TPU stand-in for ``tools/train.py`` + mmcv runner.

Usage:
    python tools/train.py imvoxelnet_kitti --data-root data/kitti \\
        --ann-file data/kitti/kitti_infos_train.pkl --work-dir work_dirs/kitti

The whole optimizer/schedule surface comes from the preset
(``imvoxelnet_tpu/configs/presets.py``): AdamW 1e-4 / wd 1e-4, backbone
lr_mult 0.1, grad-clip 35, step LR [8, 11] / 12 epochs.  Training is GSPMD
data-parallel over every visible device; checkpoints are atomic with config
metadata and auto-resume (SURVEY.md §5 checkpoint/resume).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset')
    parser.add_argument('--data-root', required=True)
    parser.add_argument('--ann-file', required=True)
    parser.add_argument('--work-dir', default='work_dirs/default')
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--batch-size', type=int, default=None,
                        help='global batch (default: samples_per_device * n_devices)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--resume-from', default=None)
    parser.add_argument('--num-workers', type=int, default=8)
    parser.add_argument('--log-interval', type=int, default=50)
    parser.add_argument('--multihost', action='store_true',
                        help='call jax.distributed.initialize() (TPU pods)')
    parser.add_argument('--val-ann-file', default=None,
                        help='enable per-epoch validation on this val split '
                             '(the reference EvalHook: validate=True at '
                             'tools/train.py:155, evaluation interval=1 at '
                             'imvoxelnet_kitti.py:153)')
    parser.add_argument('--val-data-root', default=None,
                        help='val data root (default: --data-root)')
    parser.add_argument('--val-interval', type=int, default=1,
                        help='validate every N epochs')
    parser.add_argument('--val-batch-size', type=int, default=None)
    parser.add_argument('--ckpt-format', choices=('pickle', 'orbax'),
                        default='pickle',
                        help='orbax = sharded per-host checkpoint IO '
                             '(multi-host pods); pickle = single-host file')
    parser.add_argument('--override', action='append', default=None,
                        metavar='PATH=VALUE',
                        help='preset field override, e.g. '
                             'model.indoor_head.score_thr=0.1 '
                             '(repeatable; the reference --options '
                             'analog)')
    parser.add_argument('--autoscale-lr', action='store_true',
                        help='scale lr linearly with device count '
                             'relative to the reference 8-GPU runs '
                             '(tools/train.py:93-95)')
    args = parser.parse_args()

    os.environ.setdefault(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache'))
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    if args.multihost:
        jax.distributed.initialize()

    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.data.datasets import DATASETS
    from imvoxelnet_tpu.data.loader import DataLoader
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.models.detector import ImVoxelNet
    from imvoxelnet_tpu.parallel import mesh as mesh_lib
    from imvoxelnet_tpu.parallel import train as train_lib
    from imvoxelnet_tpu.utils import checkpoint as ckpt_lib

    preset = get_preset(args.preset)
    if args.override:
        from imvoxelnet_tpu.configs.presets import apply_overrides
        preset = apply_overrides(preset, args.override)
    os.makedirs(args.work_dir, exist_ok=True)

    n_dev = len(jax.devices())
    if args.autoscale_lr:
        # linear LR scaling relative to the reference's 8-GPU runs
        # (tools/train.py:93-95: lr * n_gpus / 8)
        import dataclasses
        preset = dataclasses.replace(preset, lr=preset.lr * n_dev / 8.0)
        print(f'autoscale-lr: lr={preset.lr} ({n_dev} devices / 8)')
    batch_size = args.batch_size or preset.data.samples_per_device * n_dev
    epochs = args.epochs or preset.total_epochs

    d = preset.data
    img_cfg = ImagePipelineConfig(
        test_scale=d.test_size,
        pad_size=(d.test_size[1], d.test_size[0]),
        train_pad_size=(d.train_size[1], d.train_size[0]),
        flip_ratio=d.flip_ratio,
        fixed_size_resize=(d.dataset == 'scannet'),
        train_scales=d.train_scales,
    )
    ds_key = d.dataset
    if preset.model.layout_head is not None:
        ds_key = 'sunrgbd_total'
    dataset = DATASETS[ds_key](
        args.data_root, args.ann_file, d.classes, img_cfg,
        n_images=d.n_images_train, max_gt=d.max_gt, repeat=d.repeat_times)
    transfer_dtype = None
    if preset.model.compute_dtype == 'bfloat16':
        import ml_dtypes
        transfer_dtype = ml_dtypes.bfloat16    # bit-identical, half the bytes
    loader = DataLoader(dataset, batch_size, train=True, seed=args.seed,
                        num_workers=args.num_workers,
                        images_dtype=transfer_dtype)
    steps_per_epoch = len(loader)
    print(f'dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch, '
          f'{n_dev} devices, global batch {batch_size}')

    model_cfg = preset.model
    overrode_norm = any('dp_loss_norm' in o for o in (args.override or []))
    if n_dev > 1 and model_cfg.head_kind == 'indoor' and not overrode_norm:
        # multi-chip GSPMD: the reference's cross-rank reduce_mean of the
        # indoor positive count (imvoxel_head.py:196) — see
        # docs/parity.md "DP training semantics"
        import dataclasses
        model_cfg = dataclasses.replace(model_cfg, dp_loss_norm='batch_mean')
        print('dp_loss_norm=batch_mean (multi-device indoor training)')

    model = ImVoxelNet(model_cfg)
    tx = train_lib.make_optimizer(
        preset.lr, preset.weight_decay, preset.backbone_lr_mult,
        preset.grad_clip_norm, steps_per_epoch, preset.lr_steps,
        preset.total_epochs)

    sample_batch = next(iter(loader.epoch(0)))
    state = train_lib.create_train_state(
        model, tx, jax.random.PRNGKey(args.seed), sample_batch)

    start_epoch = 0
    latest = os.path.join(
        args.work_dir,
        'latest.ckpt' if args.ckpt_format == 'pickle' else 'latest.orbax')
    resume = args.resume_from or (latest if os.path.exists(latest) else None)
    if resume:
        if os.path.isdir(resume):   # orbax: restore with the state's structure
            payload = ckpt_lib.load_checkpoint_sharded(resume,
                                                       abstract_state=state)
            opt_state = payload['opt_state']
        else:
            payload = ckpt_lib.load_checkpoint(resume)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: b, state.opt_state, payload['opt_state'])
        state = state.replace(
            params=payload['params'], batch_stats=payload['batch_stats'],
            opt_state=opt_state, step=payload['step'])
        start_epoch = payload['meta'].get('epoch', 0)
        print(f'resumed from {resume} at epoch {start_epoch}')

    mesh = mesh_lib.make_mesh()
    rep = mesh_lib.replicated(mesh)
    dp = mesh_lib.batch_sharding(mesh)
    state = jax.device_put(state, rep)
    step_fn = jax.jit(train_lib.make_train_step(model, tx),
                      in_shardings=(rep, dp), out_shardings=(rep, rep))

    log_path = os.path.join(args.work_dir, 'train_log.jsonl')
    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        tb_writer = SummaryWriter(os.path.join(args.work_dir, 'tb'))
    except Exception:
        pass

    val_dataset = val_loader = val_forward = None
    if args.val_ann_file:
        from imvoxelnet_tpu.eval import runner as eval_runner
        val_dataset, val_loader = eval_runner.build_val_dataset(
            preset, args.preset, args.val_data_root or args.data_root,
            args.val_ann_file, num_workers=args.num_workers,
            batch_size=args.val_batch_size)
        val_mesh = mesh if n_dev > 1 else None
        val_forward = eval_runner.make_forward(preset, model, val_mesh)
        print(f'validation: {len(val_dataset)} samples every '
              f'{args.val_interval} epoch(s)')

    def run_validation(epoch):
        from imvoxelnet_tpu.eval import runner as eval_runner
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        results = eval_runner.run_inference(
            val_forward, variables, val_loader, len(val_dataset.data_infos),
            mesh if n_dev > 1 else None)
        metrics = eval_runner.evaluate_results(
            preset, args.preset, val_dataset, results)
        line = dict(mode='val', epoch=epoch + 1, step=int(state.step),
                    **{k: float(v) for k, v in metrics.items()})
        print(json.dumps(line), flush=True)
        with open(log_path, 'a') as f:
            f.write(json.dumps(line) + '\n')
        if tb_writer is not None:
            for k, v in metrics.items():
                tb_writer.add_scalar(f'val/{k}', float(v), int(state.step))
    import functools
    place = functools.partial(mesh_lib.shard_batch, mesh=mesh)
    for epoch in range(start_epoch, epochs):
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        # device_prefetch: the worker thread uploads batch N+1 while step N
        # executes — through the axon tunnel the device_put RPC otherwise
        # serializes with every step (docs/performance.md).  With prefetch,
        # the logged data_time is QUEUE-WAIT (time the step blocked on input
        # not yet ready), not host pipeline time — 0 means fully overlapped,
        # unlike the reference's DataLoader data_time which measures the
        # pipeline itself.
        for it, batch in enumerate(mesh_lib.device_prefetch(
                loader.epoch(epoch), place)):
            t1 = time.perf_counter()
            t_data += t1 - t0
            state, metrics = step_fn(state, batch)
            if (it + 1) % args.log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                jax.block_until_ready(state.params)
                t2 = time.perf_counter()
                t_step += t2 - t1
                line = dict(epoch=epoch, iter=it + 1, step=int(state.step),
                            data_time=t_data / args.log_interval,
                            time=(t_data + t_step) / args.log_interval,
                            **metrics)
                print(json.dumps(line), flush=True)
                with open(log_path, 'a') as f:
                    f.write(json.dumps(line) + '\n')
                if tb_writer is not None:
                    for k, v in metrics.items():
                        tb_writer.add_scalar(f'train/{k}', v, int(state.step))
                t_data = t_step = 0.0
            else:
                t_step += time.perf_counter() - t1
            t0 = time.perf_counter()

        meta = dict(preset=args.preset, classes=list(d.classes),
                    epoch=epoch + 1)
        if args.ckpt_format == 'orbax':
            # sharded save: each host writes its own shards, no device_get
            ckpt_lib.save_checkpoint_sharded(latest, state, metadata=meta)
        else:
            ckpt_lib.save_checkpoint(latest, jax.device_get(state),
                                     metadata=meta)
        print(f'epoch {epoch + 1}/{epochs} done; checkpoint saved')
        if val_forward is not None and (epoch + 1) % args.val_interval == 0:
            run_validation(epoch)


if __name__ == '__main__':
    main()
