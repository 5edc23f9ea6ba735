"""Single-scene inference demo.

Parity: the reference's demo path (``apis/inference.py`` +
``MultiViewMixin.show`` via ``tools/test.py --show``): run a preset on one
sample of a prepared dataset and write wireframe renderings.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('preset')
    parser.add_argument('--data-root', required=True)
    parser.add_argument('--ann-file', required=True)
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--torch-checkpoint', default=None)
    parser.add_argument('--out-dir', default='work_dirs/demo')
    parser.add_argument('--obj', action='store_true',
                        help='also export a MeshLab .obj wireframe')
    args = parser.parse_args()

    import numpy as np

    from imvoxelnet_tpu.apis import init_detector
    from imvoxelnet_tpu.data.datasets import DATASETS
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.utils.visualize import (export_boxes_obj,
                                                show_multi_view_result)

    preset, model, variables, forward = init_detector(
        args.preset, args.checkpoint, args.torch_checkpoint)
    d = preset.data
    img_cfg = ImagePipelineConfig(
        test_scale=d.test_size, pad_size=(d.test_size[1], d.test_size[0]),
        fixed_size_resize=(d.dataset == 'scannet'))
    ds_key = d.dataset if preset.model.layout_head is None else 'sunrgbd_total'
    dataset = DATASETS[ds_key](
        args.data_root, args.ann_file, d.classes, img_cfg,
        n_images=d.n_images_test, max_gt=d.max_gt, test_mode=True)

    import jax
    rng = np.random.RandomState(0)
    batch = dataset.collate([dataset.get_sample(args.index, False, rng)])
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = jax.device_get(forward(variables, batch))
    valid = out['valid'][0]
    boxes = out['boxes'][0][valid]
    scores = out['scores'][0][valid]
    print(f'{valid.sum()} detections; top scores: '
          f'{np.sort(scores)[::-1][:5].round(3).tolist()}')

    paths = show_multi_view_result(dataset, args.index, boxes, args.out_dir)
    print('wrote:', *paths, sep='\n  ')
    if args.obj:
        obj = export_boxes_obj(
            boxes, os.path.join(args.out_dir, f'{args.index}.obj'))
        print('wrote:', obj)


if __name__ == '__main__':
    main()
