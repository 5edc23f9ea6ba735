"""Evaluation CLI — the TPU stand-in for ``tools/test.py``.

Runs the jitted ``simple_test`` forward over the validation set and the
matching evaluation protocol (indoor mAP / KITTI AP11), printing the
reference's metric names.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset')
    parser.add_argument('--data-root', required=True)
    parser.add_argument('--ann-file', required=True)
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--torch-checkpoint', default=None,
                        help='reference torch state_dict to convert+load')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--num-workers', type=int, default=8)
    parser.add_argument('--out', default=None, help='dump results pkl')
    args = parser.parse_args()

    import jax
    import numpy as np

    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.data.datasets import DATASETS
    from imvoxelnet_tpu.data.loader import DataLoader
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.models.detector import (ImVoxelNet, imvoxelnet_predict)
    from imvoxelnet_tpu.utils import checkpoint as ckpt_lib

    preset = get_preset(args.preset)
    d = preset.data
    img_cfg = ImagePipelineConfig(
        test_scale=d.test_size, pad_size=(d.test_size[1], d.test_size[0]),
        fixed_size_resize=(d.dataset == 'scannet'))
    ds_key = d.dataset
    if preset.model.layout_head is not None:
        ds_key = 'sunrgbd_total'
    dataset = DATASETS[ds_key](
        args.data_root, args.ann_file, d.classes, img_cfg,
        n_images=d.n_images_test, max_gt=d.max_gt, test_mode=True)
    loader = DataLoader(dataset, args.batch_size, train=False,
                        num_workers=args.num_workers, drop_last=False)

    model = ImVoxelNet(preset.model)
    sample = next(iter(loader.epoch(0)))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if args.torch_checkpoint:
        sd = ckpt_lib.load_torch_state_dict(args.torch_checkpoint)
        variables = ckpt_lib.convert_reference_checkpoint(sd, preset.model)
    elif args.checkpoint:
        payload = ckpt_lib.load_checkpoint(args.checkpoint)
        variables = {'params': payload['params'],
                     'batch_stats': payload['batch_stats']}

    use_pred_ext = preset.model.layout_head is not None

    # distributed eval (the multi_gpu_test analog): shard the batch over all
    # devices; results come back globally (GSPMD inserts the gathers)
    from imvoxelnet_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    rep = mesh_lib.replicated(mesh)
    dp = mesh_lib.batch_sharding(mesh)
    n_dev = len(jax.devices())
    shard = args.batch_size % n_dev == 0 and n_dev > 1

    @jax.jit
    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False,
                           use_predicted_extrinsics=use_pred_ext)
        return imvoxelnet_predict(preset.model, *outs, batch)

    if shard:
        forward = jax.jit(forward, in_shardings=(rep, dp),
                          out_shardings=rep)
        variables = jax.device_put(variables, rep)

    results = []
    for batch in loader.epoch(0):
        if shard and batch['images'].shape[0] % n_dev != 0:
            shortfall = -batch['images'].shape[0] % n_dev
            import numpy as _np
            batch = {k: _np.concatenate([v] + [v[-1:]] * shortfall)
                     for k, v in batch.items()}
        if shard:
            batch = mesh_lib.shard_batch(batch, mesh)
        out = jax.device_get(forward(variables, batch))
        b = batch['images'].shape[0]
        for i in range(b):
            valid = out['valid'][i]
            res = dict(boxes=out['boxes'][i][valid],
                       scores=out['scores'][i][valid],
                       labels=out['labels'][i][valid])
            if 'angles' in out:
                res['angles'] = out['angles'][i]
                res['layout'] = out['layout'][i]
            results.append(res)
    results = results[:len(dataset.data_infos)]
    print(f'inference done: {len(results)} samples')

    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)

    if d.dataset == 'kitti':
        from imvoxelnet_tpu.eval.kitti_eval import (convert_to_kitti_annos,
                                                    kitti_eval)
        dt_annos = convert_to_kitti_annos(results, dataset.data_infos,
                                          d.classes)
        gt_annos = [info['annos'] for info in dataset.data_infos]
        metrics = kitti_eval(gt_annos, dt_annos, list(d.classes),
                             eval_types=('bbox', 'bev', '3d'))
    else:
        from imvoxelnet_tpu.eval.indoor_eval import indoor_eval
        gt_annos = []
        for i in range(len(dataset.data_infos)):
            ann = dataset.get_ann_info(i)
            gt_annos.append(dict(boxes=ann['gt_bboxes_3d'],
                                 labels=ann['gt_labels_3d']))
        iou_thrs = (0.15,) if 'perspective' in args.preset or 'total' in \
            args.preset else (0.25, 0.5)
        metrics = indoor_eval(gt_annos, results, d.classes, iou_thrs)
        if preset.model.layout_head is not None:
            gt_angles = np.stack([info['angles']
                                  for info in dataset.data_infos])
            pr = np.stack([r['angles'] for r in results])
            metrics['pitch_mae'] = float(
                np.mean(np.abs(pr[:, 0] - gt_angles[:, 0])) * 180 / np.pi)
            metrics['roll_mae'] = float(
                np.mean(np.abs(pr[:, 1] - gt_angles[:, 1])) * 180 / np.pi)
    print(json.dumps(metrics, indent=2))


if __name__ == '__main__':
    main()
