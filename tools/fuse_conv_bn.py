"""Fold FrozenBatchNorm affine+stats into the preceding conv weights.

Parity: ``tools/fuse_conv_bn.py`` — for frozen-BN backbones the fused model
computes the same function with one fewer elementwise op per conv.  XLA
usually fuses the affine anyway, so this mainly shrinks checkpoints and makes
exports simpler.  Operates on the known backbone structure (conv{i}/bn{i},
downsample pairs, stem conv1/bn1).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fuse_conv_bn_pair(conv, bn, eps=1e-5):
    """Fold the BN scale into the conv kernel; the shift stays in the BN bias
    (backbone convs are bias-free, so the parameter tree is unchanged)."""
    scale = bn['scale'] / np.sqrt(bn['var'] + eps)
    kernel = np.asarray(conv['kernel']) * scale            # broadcast on O
    shift = bn['bias'] - bn['mean'] * scale
    fused_bn = dict(scale=np.sqrt(np.ones_like(bn['var']) + eps) * 1.0,
                    bias=shift,
                    mean=np.zeros_like(bn['mean']),
                    var=np.ones_like(bn['var']))
    # FrozenBatchNorm computes x * scale/sqrt(var+eps) + (bias - mean*...):
    # with scale=sqrt(1+eps), var=1, mean=0 the multiplier is exactly 1.
    return dict(kernel=kernel), fused_bn


def fuse_backbone(params):
    """Fuse every (conv, FrozenBatchNorm) pair in the backbone subtree."""
    bb = params['backbone']
    pairs = [('conv1', 'bn1')]
    for name, blk in bb.items():
        if not name.startswith('layer'):
            continue
        for i in (1, 2, 3):
            pairs.append(((name, f'conv{i}'), (name, f'bn{i}')))
        if 'downsample_conv' in blk:
            pairs.append(((name, 'downsample_conv'), (name, 'downsample_bn')))

    def get(tree, key):
        if isinstance(key, tuple):
            return tree[key[0]][key[1]]
        return tree[key]

    def put(tree, key, val):
        if isinstance(key, tuple):
            tree[key[0]][key[1]] = val
        else:
            tree[key] = val

    for conv_key, bn_key in pairs:
        conv = dict(get(bb, conv_key))
        bn = get(bb, bn_key)
        fused_conv, fused_bn = fuse_conv_bn_pair(conv, bn)
        put(bb, conv_key, fused_conv)
        put(bb, bn_key, fused_bn)
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('in_ckpt')
    parser.add_argument('out_ckpt')
    args = parser.parse_args()
    with open(args.in_ckpt, 'rb') as f:
        payload = pickle.load(f)
    payload['params'] = fuse_backbone(payload['params'])
    with open(args.out_ckpt, 'wb') as f:
        pickle.dump(payload, f, protocol=4)
    print(f'fused -> {args.out_ckpt}')


if __name__ == '__main__':
    main()
