"""Host input-pipeline throughput: can the loader feed the chip?

The device side of the flagship config consumes 54.3 scenes/sec and the SUN
RGB-D ``_fast`` config 158-160 scenes/sec (docs/performance.md); the
reference hides its host pipeline inside torch DataLoader worker processes
(``workers_per_gpu`` in every config).  This measures our threaded analog
(``data/loader.py`` + ``data/pipeline.py``, cv2 + the native fused
normalize+pad releasing the GIL) end-to-end on a synthetic on-disk dataset
(``--layout kitti``: PNG 375x1242, keep-ratio resize; ``--layout sunrgbd``:
JPEG 480x640, the `_fast` protocol), across worker counts.

Besides wall throughput it reports the pure CPU cost per sample
(``time.process_time`` over a 1-worker run) and derives the core count a
target rate needs: ``cores = target * cpu_ms / 1000``.  Wall scaling curves
only mean something on a host with that many cores — this container has 1 —
so the CPU-cost number is the portable sizing output.

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


def make_sunrgbd_root(n: int) -> str:
    """SUN RGB-D layout: 480x640 JPEGs + info pkl (column-major K, Rt)."""
    import cv2
    root = tempfile.mkdtemp(prefix='loaderbench_sun_')
    os.makedirs(os.path.join(root, 'image'))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    cv2.imwrite(os.path.join(root, 'image', '000001.jpg'), img,
                [cv2.IMWRITE_JPEG_QUALITY, 90])
    fx, cx, cy = 400.0, 320.0, 240.0
    k = np.array([[fx, 0, 0], [0, fx, 0], [cx, cy, 1]], np.float64)
    box = np.array([[0.5, 3.0, -0.5, 1.0, 1.0, 1.0, 0.3]])
    info = dict(
        image=dict(image_idx=1, image_path='image/000001.jpg',
                   image_shape=np.array([480, 640], np.int32)),
        calib=dict(K=k.reshape(-1), Rt=np.eye(3)),
        annos=dict(gt_num=1, gt_boxes_upright_depth=box,
                   name=np.array(['bed']), **{'class': np.array([0])}),
    )
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump([info] * n, f)
    return root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--samples', type=int, default=256)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--workers', default='1,2,4,8',
                        help='comma-separated worker counts')
    parser.add_argument('--image-size', default='375x1242')
    parser.add_argument('--layout', choices=('kitti', 'sunrgbd'),
                        default='kitti')
    parser.add_argument('--target', type=float, default=None,
                        help='device consumption rate (scenes/sec) to size '
                             'cores for, e.g. 160 for sunrgbd _fast')
    args = parser.parse_args()

    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.data.datasets import DATASETS
    from imvoxelnet_tpu.data.loader import DataLoader
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig

    if args.layout == 'kitti':
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
        pad = d.train_size
    else:
        h, w = 480, 640
        root = make_sunrgbd_root(args.samples)
        d = get_preset('imvoxelnet_sunrgbd_fast').data
        img_cfg = ImagePipelineConfig(
            test_scale=d.test_size, pad_size=(d.test_size[1], d.test_size[0]),
            train_pad_size=(d.train_size[1], d.train_size[0]),
            flip_ratio=d.flip_ratio, train_scales=d.train_scales)
        dataset = DATASETS['sunrgbd'](
            root, os.path.join(root, 'infos.pkl'), ('bed',),
            img_cfg, n_images=1, max_gt=d.max_gt, repeat=1)
        pad = d.train_size

    print(f'{len(dataset)} samples, batch {args.batch_size}, '
          f'source {h}x{w} -> pad {pad}, layout {args.layout}')
    # warmup epoch: first-touch costs (cv2 thread pool, native lib dlopen,
    # page-cache fill) otherwise inflate whichever worker count runs first
    for _ in DataLoader(dataset, args.batch_size, train=True,
                        num_workers=2).epoch(0):
        pass
    cpu_ms = None
    for workers in (int(x) for x in args.workers.split(',')):
        loader = DataLoader(dataset, args.batch_size, train=True,
                            num_workers=workers)
        n = 0
        t0 = time.perf_counter()
        c0 = time.process_time()
        for batch in loader.epoch(0):
            n += batch['images'].shape[0]
        dt = time.perf_counter() - t0
        dc = time.process_time() - c0
        print(f'workers={workers:2d}: {n / dt:8.1f} samples/sec '
              f'({dt / n * 1e3:.2f} ms/sample wall, '
              f'{dc / n * 1e3:.2f} ms/sample CPU)')
        cpu_ms = dc / n * 1e3 if cpu_ms is None else min(cpu_ms, dc / n * 1e3)
    if args.target and cpu_ms:
        # size from the best steady-state CPU cost: wall scaling curves only
        # mean something on a host with that many cores
        cores = args.target * cpu_ms / 1e3
        print(f'sizing: {cpu_ms:.2f} ms CPU/sample -> {args.target:.0f} '
              f'scenes/sec needs ~{cores:.1f} cores '
              f'(+1 for the training loop); this host has '
              f'{os.cpu_count()} core(s)')


if __name__ == '__main__':
    main()
