"""Host input-pipeline throughput: can the loader feed the chip?

The device side of the flagship config consumes 54.3 scenes/sec
(docs/performance.md); the reference hides its host pipeline inside torch
DataLoader worker processes (``workers_per_gpu`` in every config).  This
measures our threaded analog (``data/loader.py`` + ``data/pipeline.py``,
cv2 + the native fused normalize+pad releasing the GIL) end-to-end on a
synthetic on-disk KITTI-layout dataset: PNG decode -> keep-ratio resize ->
normalize+pad -> collate, across worker counts (the C++ fused
normalize+pad is used automatically when ``native/`` can build; the numpy
pair is the bit-identical fallback).

Run on the pod host class used for training to size ``--num-workers``.
"""

import argparse
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset_root(n: int, h: int, w: int) -> str:
    import cv2
    root = tempfile.mkdtemp(prefix='loaderbench_')
    img_dir = os.path.join(root, 'training', 'image_2')
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    cv2.imwrite(os.path.join(img_dir, '000000.png'), img)
    with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl',
              'rb') as f:
        infos = pickle.load(f)
    with open(os.path.join(root, 'kitti_infos_train.pkl'), 'wb') as f:
        pickle.dump(infos * n, f)
    return root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--samples', type=int, default=256)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--workers', default='1,2,4,8',
                        help='comma-separated worker counts')
    parser.add_argument('--image-size', default='375x1242')
    args = parser.parse_args()

    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.data.datasets import DATASETS
    from imvoxelnet_tpu.data.loader import DataLoader
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig

    h, w = (int(v) for v in args.image_size.split('x'))
    root = make_dataset_root(args.samples, h, w)
    d = get_preset('imvoxelnet_kitti').data
    img_cfg = ImagePipelineConfig(
        test_scale=d.test_size, pad_size=(d.test_size[1], d.test_size[0]),
        train_pad_size=(d.train_size[1], d.train_size[0]),
        flip_ratio=d.flip_ratio, train_scales=d.train_scales)
    dataset = DATASETS['kitti'](
        root, os.path.join(root, 'kitti_infos_train.pkl'), d.classes,
        img_cfg, n_images=1, max_gt=d.max_gt, repeat=1)

    print(f'{len(dataset)} samples, batch {args.batch_size}, '
          f'source {h}x{w} -> pad {d.train_size}')
    for workers in (int(x) for x in args.workers.split(',')):
        loader = DataLoader(dataset, args.batch_size, train=True,
                            num_workers=workers)
        n = 0
        t0 = time.perf_counter()
        for batch in loader.epoch(0):
            n += batch['images'].shape[0]
        dt = time.perf_counter() - t0
        print(f'workers={workers:2d}: {n / dt:8.1f} samples/sec '
              f'({dt / n * 1e3:.2f} ms/sample)')


if __name__ == '__main__':
    main()
