"""Export a preset's serving forward as a StableHLO artifact.

The deployment analog of the reference's ``tools/publish_model.py`` +
``mmdet3d/apis/inference.py`` pair: instead of publishing a torch
checkpoint that a Python runtime must re-interpret, this ahead-of-time
exports the jitted ``simple_test`` forward (decode + NMS in-graph,
fixed-size outputs) via ``jax.export`` into one self-describing module a
JAX-less serving stack can compile and run.

  python tools/export.py imvoxelnet_kitti --out kitti.stablehlo \
      [--checkpoint ck.pkl | --torch-checkpoint ref.pth] \
      [--batch-size 1] [--platforms tpu,cpu] [--bake-weights] [--verify]

``--verify`` round-trips the artifact (deserialize + run on the current
backend) and checks the detections against the direct ``model.apply``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset', nargs='?', default='imvoxelnet_kitti')
    parser.add_argument('--out', required=True)
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--poly-batch', action='store_true',
                        help='export with a symbolic batch dim: one '
                             'artifact serves any batch size (--batch-size '
                             'then only sizes the --verify run)')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--torch-checkpoint', default=None)
    parser.add_argument('--platforms', default=None,
                        help='comma list, e.g. tpu,cpu (default: current '
                             'backend only)')
    parser.add_argument('--bake-weights', action='store_true',
                        help='embed params as module constants (single-file '
                             'deploy; artifact grows by the param bytes)')
    parser.add_argument('--view-sharded', action='store_true',
                        help='multi-device artifact: view axis sharded over '
                             'all local devices (backbone/FPN/gather per '
                             'shard, psum pool; exact match to unsharded)')
    parser.add_argument('--data-sharded', action='store_true',
                        help='multi-device throughput artifact: batch axis '
                             'GSPMD-sharded over all local devices')
    parser.add_argument('--verify', action='store_true',
                        help='deserialize + run on the current backend, '
                             'check vs direct apply')
    parser.add_argument('--override', action='append', default=None,
                        metavar='PATH=VALUE',
                        help='preset field override, e.g. '
                             'model.indoor_head.score_thr=0.1 '
                             '(repeatable; the reference --options '
                             'analog)')
    args = parser.parse_args()
    if sum([args.view_sharded, args.data_sharded, args.poly_batch]) > 1:
        parser.error('--view-sharded / --data-sharded / --poly-batch are '
                     'mutually exclusive (sharded programs need concrete '
                     'shapes and one sharding)')

    import jax
    import numpy as np

    from __graft_entry__ import _kitti_batch
    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.utils import checkpoint as ckpt_lib
    from imvoxelnet_tpu.utils import export as export_lib

    preset = get_preset(args.preset)
    if args.override:
        from imvoxelnet_tpu.configs.presets import apply_overrides
        preset = apply_overrides(preset, args.override)
    w, h = preset.data.test_size
    batch = _kitti_batch(args.batch_size, preset.data.n_images_test, h, w)

    if args.torch_checkpoint:
        sd = ckpt_lib.load_torch_state_dict(args.torch_checkpoint)
        variables = ckpt_lib.convert_reference_checkpoint(sd, preset.model)
    elif args.checkpoint:
        payload = ckpt_lib.load_checkpoint(args.checkpoint)
        variables = {'params': payload['params'],
                     'batch_stats': payload['batch_stats']}
    else:
        from imvoxelnet_tpu.models.detector import ImVoxelNet
        variables = ImVoxelNet(preset.model).init(
            jax.random.PRNGKey(0), batch, train=False)

    view_mesh = data_mesh = None
    if args.view_sharded:
        from imvoxelnet_tpu.parallel import mesh as mesh_lib
        view_mesh = mesh_lib.make_mesh(axis_name='view')
        if preset.data.n_images_test % view_mesh.size:
            parser.error(f'n_images_test={preset.data.n_images_test} must '
                         f'divide over {view_mesh.size} devices')
    if args.data_sharded:
        from imvoxelnet_tpu.parallel import mesh as mesh_lib
        data_mesh = mesh_lib.make_mesh(axis_name='data')
        if args.batch_size % data_mesh.size:
            parser.error(f'--batch-size {args.batch_size} must divide over '
                         f'{data_mesh.size} devices')

    platforms = args.platforms.split(',') if args.platforms else None
    spec = export_lib.serving_batch_spec(
        preset.data, preset.model,
        None if args.poly_batch else args.batch_size)
    exported = export_lib.export_serving(
        preset.model, spec, variables, platforms=platforms,
        bake_variables=args.bake_weights, view_mesh=view_mesh,
        data_mesh=data_mesh)
    size = export_lib.save_exported(exported, args.out)

    verified = None
    if args.verify:
        from jax.sharding import NamedSharding, PartitionSpec as P

        loaded = export_lib.load_exported(args.out)
        call_vars, call_batch = variables, batch
        if view_mesh is not None:
            # a multi-device artifact needs mesh-committed arguments
            rep = NamedSharding(view_mesh, P())
            call_vars = jax.device_put(variables, rep)
            call_batch = {
                k: jax.device_put(
                    v, NamedSharding(view_mesh, P(None, 'view'))
                    if k in ('images', 'extrinsics') else rep)
                for k, v in batch.items()}
        if data_mesh is not None:
            dp = NamedSharding(data_mesh, P('data'))
            call_vars = jax.device_put(variables,
                                       NamedSharding(data_mesh, P()))
            call_batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dp), batch)
        got = (jax.jit(loaded.call)(call_batch) if args.bake_weights
               else jax.jit(loaded.call)(call_vars, call_batch))
        want = export_lib.make_serving_fn(preset.model)(variables, batch)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-5, atol=1e-5)
        verified = True

    print(json.dumps(dict(
        preset=args.preset, out=args.out, bytes=size,
        platforms=list(exported.platforms),
        devices=exported.nr_devices,
        weights='baked' if args.bake_weights else 'inputs',
        outputs={k: [d if isinstance(d, int) else str(d) for d in v.shape]
                 for k, v in jax.tree_util.tree_unflatten(
                     exported.out_tree, exported.out_avals).items()},
        verified=verified)))


if __name__ == '__main__':
    main()
