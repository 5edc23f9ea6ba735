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
    parser.add_argument('--show-dir', default=None,
                        help='render predicted wireframes into each view of '
                             'the first --show-num samples (the reference '
                             'tools/test.py --show/--show-dir analog, '
                             'MultiViewMixin.show)')
    parser.add_argument('--show-num', type=int, default=3)
    parser.add_argument('--show-score-thr', type=float, default=0.3)
    parser.add_argument('--override', action='append', default=None,
                        metavar='PATH=VALUE',
                        help='preset field override, e.g. '
                             'model.indoor_head.score_thr=0.1 '
                             '(repeatable; the reference --options '
                             'analog)')
    args = parser.parse_args()

    os.environ.setdefault(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache'))
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.eval import runner
    from imvoxelnet_tpu.models.detector import ImVoxelNet
    from imvoxelnet_tpu.utils import checkpoint as ckpt_lib

    preset = get_preset(args.preset)
    if args.override:
        from imvoxelnet_tpu.configs.presets import apply_overrides
        preset = apply_overrides(preset, args.override)
    dataset, loader = runner.build_val_dataset(
        preset, args.preset, args.data_root, args.ann_file,
        num_workers=args.num_workers, batch_size=args.batch_size)

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

    # distributed eval (the multi_gpu_test analog): shard the batch over all
    # devices; results come back globally (GSPMD inserts the gathers)
    from imvoxelnet_tpu.parallel import mesh as mesh_lib
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh() if (
        args.batch_size % n_dev == 0 and n_dev > 1) else None
    if mesh is not None:
        variables = jax.device_put(variables, mesh_lib.replicated(mesh))

    forward = runner.make_forward(preset, model, mesh)
    results = runner.run_inference(forward, variables, loader,
                                   len(dataset.data_infos), mesh)
    print(f'inference done: {len(results)} samples')

    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)

    if args.show_dir:
        from imvoxelnet_tpu.utils.visualize import show_multi_view_result
        for idx in range(min(args.show_num, len(results))):
            r = results[idx]
            keep = r['scores'] > args.show_score_thr
            paths = show_multi_view_result(
                dataset, idx, r['boxes'][keep], args.show_dir)
            print('wrote:', *paths, sep='\n  ')

    metrics = runner.evaluate_results(preset, args.preset, dataset, results)
    print(json.dumps(metrics, indent=2))


if __name__ == '__main__':
    main()
