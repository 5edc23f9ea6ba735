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
    args = parser.parse_args()

    import jax
    import numpy as np

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
    os.makedirs(args.work_dir, exist_ok=True)

    n_dev = len(jax.devices())
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
    loader = DataLoader(dataset, batch_size, train=True, seed=args.seed,
                        num_workers=args.num_workers)
    steps_per_epoch = len(loader)
    print(f'dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch, '
          f'{n_dev} devices, global batch {batch_size}')

    model = ImVoxelNet(preset.model)
    tx = train_lib.make_optimizer(
        preset.lr, preset.weight_decay, preset.backbone_lr_mult,
        preset.grad_clip_norm, steps_per_epoch, preset.lr_steps,
        preset.total_epochs)

    sample_batch = next(iter(loader.epoch(0)))
    state = train_lib.create_train_state(
        model, tx, jax.random.PRNGKey(args.seed), sample_batch)

    start_epoch = 0
    latest = os.path.join(args.work_dir, 'latest.ckpt')
    resume = args.resume_from or (latest if os.path.exists(latest) else None)
    if resume:
        payload = ckpt_lib.load_checkpoint(resume)
        state = state.replace(
            params=payload['params'], batch_stats=payload['batch_stats'],
            opt_state=jax.tree_util.tree_map(
                lambda a, b: b, state.opt_state, payload['opt_state']),
            step=payload['step'])
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
    for epoch in range(start_epoch, epochs):
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        for it, batch in enumerate(loader.epoch(epoch)):
            t1 = time.perf_counter()
            t_data += t1 - t0
            batch = mesh_lib.shard_batch(batch, mesh)
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

        ckpt_lib.save_checkpoint(
            latest, jax.device_get(state),
            metadata=dict(preset=args.preset, classes=list(d.classes),
                          epoch=epoch + 1))
        print(f'epoch {epoch + 1}/{epochs} done; checkpoint saved')


if __name__ == '__main__':
    main()
