"""Data preparation CLI — the TPU stand-in for ``tools/create_data.py``.

Supported:
    kitti               -> kitti_infos_{train,val}.pkl
    sunrgbd             -> sunrgbd_imvoxelnet_infos_{train,val}.pkl
    sunrgbd_monocular   -> sunrgbd_monocular_infos_{train,val}.pkl (30 cls)
    sunrgbd_total       -> sunrgbd_total_infos_{train,val}.pkl (from json)
    scannet             -> scannet_imvoxelnet_infos_{train,val}.pkl
    scannet_images      -> posed_images/ extraction from .sens streams
    nuscenes            -> requires the nuscenes-devkit (not bundled)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('dataset', choices=[
        'kitti', 'sunrgbd', 'sunrgbd_monocular', 'sunrgbd_total', 'scannet',
        'scannet_images', 'nuscenes'])
    parser.add_argument('--root-path', required=True)
    parser.add_argument('--splits', nargs='+', default=['train', 'val'])
    parser.add_argument('--max-frames', type=int, default=300)
    parser.add_argument('--workers', type=int, default=8)
    args = parser.parse_args()

    if args.dataset == 'kitti':
        from imvoxelnet_tpu.data.converters.kitti_converter import (
            create_kitti_infos)
        for split in args.splits:
            create_kitti_infos(args.root_path, split, args.workers)
    elif args.dataset in ('sunrgbd', 'sunrgbd_monocular'):
        from imvoxelnet_tpu.data.converters.sunrgbd_converter import (
            create_sunrgbd_infos)
        for split in args.splits:
            create_sunrgbd_infos(args.root_path, split,
                                 monocular=args.dataset.endswith('monocular'),
                                 num_workers=args.workers)
    elif args.dataset == 'sunrgbd_total':
        from imvoxelnet_tpu.data.converters.sunrgbd_total_converter import (
            convert_total_sunrgbd)
        for split in args.splits:
            convert_total_sunrgbd(os.path.join(
                args.root_path, f'sunrgbd_total_infos_{split}.json'))
    elif args.dataset == 'scannet_images':
        from imvoxelnet_tpu.data.converters.scannet_converter import (
            extract_posed_images)
        extract_posed_images(args.root_path, args.max_frames, args.workers)
    elif args.dataset == 'scannet':
        from imvoxelnet_tpu.data.converters.scannet_converter import (
            create_scannet_infos)
        for split in args.splits:
            create_scannet_infos(args.root_path, split)
    else:
        raise SystemExit(
            'nuScenes info generation needs the nuscenes-devkit; '
            'run the reference converter or install the devkit.')


if __name__ == '__main__':
    main()
