"""Fabricate a multi-scene synthetic KITTI split for hardware train runs.

Scales the single-scene fabrication of ``tools/validate_learning.py`` to N
distinct scenes: each frame places 1-4 Cars at random road-plausible camera
locations with bright blobs at their projected image positions, at the real
KITTI resolution (1242x375), using the reference fixture's calibration
(``/root/reference/tests/data/kitti/kitti_infos_train.pkl`` — the same P2 /
R0_rect / Tr_velo_to_cam the integration tests already consume).  The output
directory is a drop-in ``--data-root`` for ``tools/train.py`` /
``tools/test.py`` with ``kitti_infos_train.pkl`` + ``kitti_infos_val.pkl``.

    python tools/make_synthetic_kitti.py --out /tmp/kitti_syn \
        --train 400 --val 32

This exists to drive the production train CLI on real TPU hardware with a
realistically-sized epoch (no real KITTI data ships in this container);
learning signal is real (the blobs are at the geometrically correct
projections), so val mAP rises above zero within an epoch.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_INFO = '/root/reference/tests/data/kitti/kitti_infos_train.pkl'


def make_split(base, root, name, n_scenes, rng, start_idx=0):
    import cv2
    calib = base['calib']
    p2 = calib['P2'].astype(np.float64)
    infos = []
    img_dir = os.path.join(root, 'training', 'image_2')
    os.makedirs(img_dir, exist_ok=True)
    for s in range(n_scenes):
        idx = start_idx + s
        # Retry until at least one car lands inside the frustum so every
        # requested index is written exactly once (a skipped index would let a
        # later split starting at `start_idx + n_scenes` stay disjoint but
        # shrink the epoch; worse, the pre-fix code skipped indices AND
        # started val at the written-count, overwriting train PNGs).
        names = []
        for _attempt in range(64):
            n_cars = rng.randint(1, 5)
            img = rng.randint(0, 60, (375, 1242, 3)).astype(np.uint8)
            names, bboxes, dims, locs, rots = [], [], [], [], []
            for _ in range(n_cars):
                # camera frame: x right, y down (ground ~1.6m below cam), z fwd
                loc = np.array([rng.uniform(-8.0, 8.0), rng.uniform(1.4, 1.7),
                                rng.uniform(8.0, 45.0)])
                rot = rng.uniform(-np.pi, np.pi)
                l, h, w = (rng.uniform(3.5, 4.5), rng.uniform(1.4, 1.8),
                           rng.uniform(1.5, 1.8))
                uvw = p2[:3, :3] @ loc + p2[:3, 3]
                u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
                if not (40 < u < 1202 and 40 < v < 345):
                    continue
                # apparent size ~ focal * metric / depth; jitter intensity so
                # the score distribution is not degenerate
                fu = p2[0, 0]
                hw = max(6, int(fu * l / (2.5 * loc[2])))
                hh = max(5, int(fu * h / (2.0 * loc[2])))
                tint = int(rng.uniform(140, 255))
                cv2.rectangle(img, (int(u) - hw, int(v) - hh),
                              (int(u) + hw, int(v) + int(0.4 * hh)),
                              (tint, tint, tint), -1)
                names.append('Car')
                bboxes.append([u - hw, v - hh, u + hw, v + 0.4 * hh])
                dims.append([l, h, w])
                locs.append(loc)
                rots.append(rot)
            if names:
                break
        assert names, f'scene {idx}: no in-frustum car after 64 attempts'
        k = len(names)
        rel = f'training/image_2/{idx:06d}.png'
        cv2.imwrite(os.path.join(root, rel), img)
        info = dict(base)
        info['image'] = dict(base['image'],
                             image_idx=idx, image_path=rel,
                             image_shape=np.array([375, 1242], np.int32))
        info['annos'] = dict(
            name=np.array(names),
            truncated=np.zeros(k), occluded=np.zeros(k, np.int64),
            alpha=np.asarray(rots),
            bbox=np.asarray(bboxes, np.float64),
            dimensions=np.asarray(dims, np.float64),
            location=np.asarray(locs, np.float64),
            rotation_y=np.asarray(rots, np.float64),
            score=np.zeros(k), index=np.arange(k, dtype=np.int32),
            group_ids=np.arange(k, dtype=np.int32),
            difficulty=np.zeros(k, np.int32),
        )
        infos.append(info)
    out = os.path.join(root, f'kitti_infos_{name}.pkl')
    with open(out, 'wb') as f:
        pickle.dump(infos, f)
    print(f'{name}: {len(infos)} scenes -> {out}')
    return len(infos)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True)
    parser.add_argument('--train', type=int, default=400)
    parser.add_argument('--val', type=int, default=32)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    with open(REF_INFO, 'rb') as f:
        base = pickle.load(f)[0]
    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)
    # Val indices start at the REQUESTED train count, not the written count,
    # so the two splits can never share an image index.
    make_split(base, args.out, 'train', args.train, rng)
    make_split(base, args.out, 'val', args.val, rng, start_idx=args.train)


if __name__ == '__main__':
    main()
