"""Torch-checkpoint -> JAX pytree converter.

SURVEY.md §5 names this the explicit north-star requirement: the 6 released
reference checkpoints (plain torch ``state_dict``s with mmdet naming,
``/root/reference/README.md:94-99``) must load into the TPU model.  The
conversion is pure renaming + layout transposes:

  torch Conv2d  (O, I, kH, kW)        -> flax (kH, kW, I, O)
  torch Conv3d  (O, I, kD, kH, kW)    -> flax (kD, kH, kW, I, O)
  torch ConvT3d (I, O, kD, kH, kW)    -> flax ConvTranspose(transpose_kernel=
                                         True) kernel (kD, kH, kW, O, I)
  torch BN      weight/bias/running_* -> scale/bias + batch_stats mean/var
                                         (FrozenBatchNorm: all four as params)
  torch Linear  (O, I) + bias         -> flax Dense kernel (I, O)

Also provides ``save_checkpoint`` / ``load_checkpoint`` with metadata
(config name, classes, step) — the TPU stand-in for mmcv's CheckpointHook
payload (``tools/train.py:146-152``).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


def _t(x):
    return np.asarray(x, np.float32)


def conv2d(w):
    return _t(w).transpose(2, 3, 1, 0)


def conv3d(w):
    return _t(w).transpose(2, 3, 4, 1, 0)


def convtranspose3d(w):
    # torch (I, O, kD, kH, kW) -> flax transpose_kernel=True (kD, kH, kW, O, I)
    return _t(w).transpose(2, 3, 4, 1, 0)


def linear(w):
    return _t(w).transpose(1, 0)


def frozen_bn(sd, prefix):
    return {
        'scale': _t(sd[f'{prefix}.weight']),
        'bias': _t(sd[f'{prefix}.bias']),
        'mean': _t(sd[f'{prefix}.running_mean']),
        'var': _t(sd[f'{prefix}.running_var']),
    }


def bn_split(sd, prefix):
    """Train-mode BN -> (params, batch_stats)."""
    params = {'scale': _t(sd[f'{prefix}.weight']),
              'bias': _t(sd[f'{prefix}.bias'])}
    stats = {'mean': _t(sd[f'{prefix}.running_mean']),
             'var': _t(sd[f'{prefix}.running_var'])}
    return params, stats


# ---------------------------------------------------------------------------
# Backbone: torchvision / mmdet ResNet-50 naming
# ---------------------------------------------------------------------------

_STAGE_BLOCKS = (3, 4, 6, 3)


def convert_resnet50(sd, prefix='', stage_with_dcn=(False,) * 4):
    """``{prefix}conv1.weight`` etc. -> flax 'backbone' params subtree.

    ``stage_with_dcn``: stages whose conv2 is mmcv DCNv2 (weight +
    ``conv2.conv_offset``) — the nuScenes backbone.
    """
    p = prefix
    out = {
        'conv1': {'kernel': conv2d(sd[f'{p}conv1.weight'])},
        'bn1': frozen_bn(sd, f'{p}bn1'),
    }
    for stage, n_blocks in enumerate(_STAGE_BLOCKS, start=1):
        for b in range(n_blocks):
            tb = f'{p}layer{stage}.{b}'
            blk = {}
            for i in (1, 2, 3):
                if i == 2 and stage_with_dcn[stage - 1]:
                    blk['conv2'] = {
                        'kernel': conv2d(sd[f'{tb}.conv2.weight']),
                        'conv_offset': {
                            'kernel': conv2d(
                                sd[f'{tb}.conv2.conv_offset.weight']),
                            'bias': _t(sd[f'{tb}.conv2.conv_offset.bias']),
                        },
                    }
                else:
                    blk[f'conv{i}'] = {
                        'kernel': conv2d(sd[f'{tb}.conv{i}.weight'])}
                blk[f'bn{i}'] = frozen_bn(sd, f'{tb}.bn{i}')
            if f'{tb}.downsample.0.weight' in sd:
                blk['downsample_conv'] = {
                    'kernel': conv2d(sd[f'{tb}.downsample.0.weight'])}
                blk['downsample_bn'] = frozen_bn(sd, f'{tb}.downsample.1')
            out[f'layer{stage}_{b}'] = blk
    return out


def convert_fpn(sd, n_levels=4, prefix='neck.'):
    """mmdet FPN: lateral_convs.{i}.conv / fpn_convs.{i}.conv."""
    out = {}
    for i in range(n_levels):
        out[f'lateral_{i}'] = {
            'kernel': conv2d(sd[f'{prefix}lateral_convs.{i}.conv.weight']),
            'bias': _t(sd[f'{prefix}lateral_convs.{i}.conv.bias'])}
        out[f'fpn_{i}'] = {
            'kernel': conv2d(sd[f'{prefix}fpn_convs.{i}.conv.weight']),
            'bias': _t(sd[f'{prefix}fpn_convs.{i}.conv.bias'])}
    return out


# ---------------------------------------------------------------------------
# 3D necks
# ---------------------------------------------------------------------------

def _basicblock3d(sd, prefix):
    params = {
        'conv1': {'kernel': conv3d(sd[f'{prefix}.conv1.weight'])},
        'conv2': {'kernel': conv3d(sd[f'{prefix}.conv2.weight'])},
    }
    p1, s1 = bn_split(sd, f'{prefix}.bn1')
    p2, s2 = bn_split(sd, f'{prefix}.bn2')
    params['bn1'] = {'bn': p1}
    params['bn2'] = p2
    stats = {'bn1': {'bn': s1}, 'bn2': s2}
    return params, stats


def _conv_bn_relu(sd, conv_key, bn_key):
    params = {'conv': {'kernel': conv3d(sd[f'{conv_key}.weight'])}}
    if f'{conv_key}.bias' in sd:
        params['conv']['bias'] = _t(sd[f'{conv_key}.bias'])
    bp, bs = bn_split(sd, bn_key)
    params['norm'] = {'bn': bp}
    return params, {'norm': {'bn': bs}}


def convert_kitti_neck(sd, prefix='neck_3d.'):
    """KittiImVoxelNeck / NuScenesImVoxelNeck: nn.Sequential ``model.{i}``."""
    params, stats = {}, {}
    mapping = [('block0', 'model.0', 'block'), ('down0', 'model.1', 'conv'),
               ('block1', 'model.2', 'block'), ('down1', 'model.3', 'conv'),
               ('block2', 'model.4', 'block'), ('out_conv', 'model.5', 'conv')]
    for name, tname, kind in mapping:
        if kind == 'block':
            p, s = _basicblock3d(sd, f'{prefix}{tname}')
        else:
            p, s = _conv_bn_relu(sd, f'{prefix}{tname}.0', f'{prefix}{tname}.1')
        params[name] = p
        stats[name] = s
    return params, stats


convert_nuscenes_neck = convert_kitti_neck


def convert_imvoxel_neck(sd, channels=(64, 128, 256, 512),
                         down_layers=(1, 2, 3, 4), up_layers=(3, 2, 1),
                         prefix='neck_3d.'):
    """ImVoxelNeck: EncoderDecoder layers_down / layers_up / proj / conv_blocks."""
    params, stats = {}, {}
    for i in range(len(channels)):
        off = 0
        if i > 0:
            # down conv + bn at Sequential positions 0, 1 (dropout at 2, relu 3)
            p = {'kernel': conv3d(sd[f'{prefix}model.layers_down.{i}.0.weight'])}
            params[f'down_conv_{i}'] = p
            bp, bs = bn_split(sd, f'{prefix}model.layers_down.{i}.1')
            params[f'down_bn_{i}'] = {'bn': bp}
            stats[f'down_bn_{i}'] = {'bn': bs}
            off = 4
        for j in range(down_layers[i]):
            bp, bs = _basicblock3d(sd, f'{prefix}model.layers_down.{i}.{off + j}')
            params[f'down_{i}_{j}'] = bp
            stats[f'down_{i}_{j}'] = bs
    for i in range(len(channels) - 1):
        params[f'up_conv_{i}'] = {
            'kernel': conv3d(sd[f'{prefix}model.layers_up_conv.{i}.weight'])}
        params[f'proj_conv_{i}'] = {
            'kernel': conv3d(sd[f'{prefix}model.proj.{i}.conv.weight'])}
        bp, bs = bn_split(sd, f'{prefix}model.proj.{i}.norm')
        params[f'proj_bn_{i}'] = {'bn': bp}
        stats[f'proj_bn_{i}'] = {'bn': bs}
        for j in range(up_layers[i]):
            bp, bs = _basicblock3d(sd, f'{prefix}model.layers_up_res.{i}.{j}')
            params[f'up_{i}_{j}'] = bp
            stats[f'up_{i}_{j}'] = bs
    for i in range(len(channels) - 1):
        params[f'out_conv_{i}'] = {
            'kernel': conv3d(sd[f'{prefix}conv_blocks.{i}.0.weight']),
            'bias': _t(sd[f'{prefix}conv_blocks.{i}.0.bias'])}
        bp, bs = bn_split(sd, f'{prefix}conv_blocks.{i}.1')
        params[f'out_bn_{i}'] = {'bn': bp}
        stats[f'out_bn_{i}'] = {'bn': bs}
    # the reference builds one conv_block per encoder channel but its forward
    # consumes only len(channels)-1 of them (``necks/imvoxelnet.py:78-88``:
    # the decoder emits 3 scales for 4 channels) — released checkpoints carry
    # the dead ``conv_blocks.{last}`` weights, so consume-and-drop them
    dead = f'{prefix}conv_blocks.{len(channels) - 1}'
    for k in (f'{dead}.0.weight', f'{dead}.0.bias'):
        if k in sd:
            sd[k]
    if f'{dead}.1.weight' in sd:
        bn_split(sd, f'{dead}.1')
    return params, stats


def _basicblock3dv2(sd, prefix, has_downsample):
    params = {
        'conv1': {'kernel': conv3d(sd[f'{prefix}.conv1.weight'])},
        'conv2': {'kernel': conv3d(sd[f'{prefix}.conv2.weight'])},
    }
    stats = {}
    for tname, fname in (('norm1', 'norm1'), ('norm2', 'norm2')):
        bp, bs = bn_split(sd, f'{prefix}.{tname}')
        params[fname] = {'bn': bp}
        stats[fname] = {'bn': bs}
    if has_downsample:
        params['downsample_conv'] = {
            'kernel': conv3d(sd[f'{prefix}.downsample.0.weight'])}
        bp, bs = bn_split(sd, f'{prefix}.downsample.1')
        params['downsample_norm'] = {'bn': bp}
        stats['downsample_norm'] = {'bn': bs}
    return params, stats


def convert_fast_neck(sd, n_blocks=(1, 1, 1), prefix='neck_3d.'):
    params, stats = {}, {}
    n_scales = len(n_blocks)
    for i in range(n_scales):
        stride = 1 if i == 0 else 2
        for j in range(n_blocks[i]):
            has_ds = (j == 0 and stride != 1)
            p, s = _basicblock3dv2(sd, f'{prefix}down_layer_{i}.{j}', has_ds)
            params[f'down_{i}_{j}'] = p
            stats[f'down_{i}_{j}'] = s
    for i in range(1, n_scales):
        params[f'up_convt_{i}'] = {
            'kernel': convtranspose3d(sd[f'{prefix}up_block_{i}.0.weight'])}
        for flax_bn, pos in ((f'up_bn1_{i}', 1), (f'up_bn2_{i}', 4)):
            bp, bs = bn_split(sd, f'{prefix}up_block_{i}.{pos}')
            params[flax_bn] = {'bn': bp}
            stats[flax_bn] = {'bn': bs}
        params[f'up_conv_{i}'] = {
            'kernel': conv3d(sd[f'{prefix}up_block_{i}.3.weight'])}
    for i in range(n_scales):
        params[f'out_conv_{i}'] = {
            'kernel': conv3d(sd[f'{prefix}out_block_{i}.0.weight'])}
        bp, bs = bn_split(sd, f'{prefix}out_block_{i}.1')
        params[f'out_bn_{i}'] = {'bn': bp}
        stats[f'out_bn_{i}'] = {'bn': bs}
    return params, stats


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def convert_anchor3d_head(sd, prefix='bbox_head.'):
    params = {
        'conv_cls': {'kernel': conv2d(sd[f'{prefix}conv_cls.weight']),
                     'bias': _t(sd[f'{prefix}conv_cls.bias'])},
        'conv_reg': {'kernel': conv2d(sd[f'{prefix}conv_reg.weight']),
                     'bias': _t(sd[f'{prefix}conv_reg.bias'])},
    }
    if f'{prefix}conv_dir_cls.weight' in sd:
        params['conv_dir_cls'] = {
            'kernel': conv2d(sd[f'{prefix}conv_dir_cls.weight']),
            'bias': _t(sd[f'{prefix}conv_dir_cls.bias'])}
    return params, {}


def convert_indoor_head(sd, n_scales=3, n_convs=0, prefix='bbox_head.'):
    params = {
        'centerness_conv': {
            'kernel': conv3d(sd[f'{prefix}centerness_conv.weight'])},
        'reg_conv': {'kernel': conv3d(sd[f'{prefix}reg_conv.weight'])},
        'cls_conv': {'kernel': conv3d(sd[f'{prefix}cls_conv.weight']),
                     'bias': _t(sd[f'{prefix}cls_conv.bias'])},
    }
    stats = {}
    for i in range(n_scales):
        params[f'scale_{i}'] = {'scale': _t(sd[f'{prefix}scales.{i}.scale'])}
    for j in range(n_convs):
        for tower, tname in (('reg', 'reg_convs'), ('cls', 'cls_convs')):
            params[f'{tower}_tower_{j}'] = {
                'kernel': conv3d(sd[f'{prefix}{tname}.{j}.0.weight'])}
            bp, bs = bn_split(sd, f'{prefix}{tname}.{j}.1')
            params[f'{tower}_tower_bn_{j}'] = bp
            stats[f'{tower}_tower_bn_{j}'] = bs
    return params, stats


def convert_layout_head(sd, prefix='head_2d.'):
    params = {}
    for head, tname in (('angle', 'angle_mlp'), ('layout', 'layout_mlp')):
        for fc, pos in (('fc1', 0), ('fc2', 3), ('fc3', 6)):
            params[f'{head}_{fc}'] = {
                'kernel': linear(sd[f'{prefix}{tname}.{pos}.weight']),
                'bias': _t(sd[f'{prefix}{tname}.{pos}.bias'])}
    return params, {}


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class _RecordingDict(dict):
    """Dict recording every key read — used to prove the converter consumes
    the complete reference state_dict (guards against naming drift between
    the released mmdet checkpoints and this converter)."""

    def __init__(self, d):
        super().__init__(d)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def convert_reference_checkpoint(state_dict, model_cfg, strict=False):
    """Reference ImVoxelNet state_dict -> {'params', 'batch_stats'}.

    ``model_cfg`` is an ``ImVoxelNetConfig`` (drives neck/head layout).
    ``strict=True`` raises if any state_dict entry was not consumed by the
    conversion (``num_batches_tracked`` counters are exempt — they carry no
    information the JAX model needs).
    """
    sd = _RecordingDict(state_dict)
    params = {'backbone': convert_resnet50(
        sd, 'backbone.', getattr(model_cfg, 'stage_with_dcn', (False,) * 4)),
              'neck': convert_fpn(sd)}
    stats = {}

    neck = model_cfg.neck
    if neck.kind in ('kitti', 'nuscenes'):
        p, s = convert_kitti_neck(sd)
    elif neck.kind == 'imvoxel':
        p, s = convert_imvoxel_neck(sd, neck.channels, neck.down_layers,
                                    neck.up_layers)
    else:
        p, s = convert_fast_neck(sd, neck.n_blocks)
    params['neck_3d'] = p
    stats['neck_3d'] = s

    if model_cfg.head_kind == 'anchor3d':
        p, s = convert_anchor3d_head(sd)
    else:
        h = model_cfg.indoor_head
        p, s = convert_indoor_head(sd, h.n_scales, h.n_convs)
    params['bbox_head'] = p
    if s:
        stats['bbox_head'] = s

    if model_cfg.layout_head is not None:
        p, _ = convert_layout_head(sd)
        params['head_2d'] = p

    if strict:
        unused = sorted(
            k for k in sd
            if k not in sd.accessed and not k.endswith('num_batches_tracked'))
        if unused:
            raise ValueError(
                f'{len(unused)} state_dict keys not consumed by the '
                f'converter (naming drift?): {unused[:10]}...')
    return {'params': params, 'batch_stats': stats}


def load_torch_state_dict(path):
    """Load a torch checkpoint file without requiring CUDA."""
    import torch
    ckpt = torch.load(path, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Native checkpoint save/load (atomic, with metadata — SURVEY.md §5)
# ---------------------------------------------------------------------------

def save_checkpoint(path, state, metadata=None):
    import jax
    path = Path(path)
    payload = {
        'params': jax.tree_util.tree_map(np.asarray, state.params),
        'batch_stats': jax.tree_util.tree_map(np.asarray, state.batch_stats),
        'opt_state': jax.tree_util.tree_map(np.asarray, state.opt_state),
        'step': int(state.step),
        'meta': metadata or {},
    }
    tmp = path.with_suffix('.tmp')
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=4)
    tmp.replace(path)  # atomic on POSIX


def load_checkpoint(path):
    """Load a checkpoint saved by either backend: a pickle file or a sharded
    orbax directory (auto-detected)."""
    path = Path(path)
    if path.is_dir():
        return load_checkpoint_sharded(path)
    with open(path, 'rb') as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Sharded (orbax) checkpointing — pod-scale: every host writes only its own
# array shards, restore places shards directly on the target mesh.  Same
# payload contract as the pickle path ({params, batch_stats, opt_state, step,
# meta}); the reference needs none of this (single-node torch.save), but
# multi-host TPU training does.
# ---------------------------------------------------------------------------

def save_checkpoint_sharded(path, state, metadata=None):
    """Atomically write an orbax checkpoint directory at ``path``.

    ``state`` may hold sharded ``jax.Array``s — no host gather happens; each
    process saves its addressable shards.  Overwrites an existing checkpoint
    at the same path (the latest.ckpt contract of ``tools/train.py``).
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    arrays = {
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'step': state.step,
    }
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(path, args=ocp.args.Composite(
            state=ocp.args.StandardSave(arrays),
            meta=ocp.args.JsonSave(metadata or {})), force=True)


def _reput_cpu_buffers(tree):
    """Re-materialize orbax-restored arrays through a host copy + fresh
    ``device_put`` — CPU backend only.

    On the CPU backend the buffers orbax hands back behave pathologically
    under a multi-device mesh: executing a jitted step whose *inputs* are
    such arrays serializes the per-device runner threads, so every
    cross-device collective rendezvous straggles (XLA logs "this thread has
    been waiting for all gather ... may be stuck"; measured 263 s vs 10.8 s
    for the same tiny 8-virtual-device train step).  A host round-trip
    produces ordinary XLA-owned buffers and restores normal scheduling.  On
    TPU the restored arrays live in HBM and no such pathology exists — and
    the round-trip would be expensive — so this is gated on the backend.
    """
    import jax
    import numpy as np

    def fix(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return jax.device_put(np.asarray(x), x.sharding)
        return x

    return jax.tree_util.tree_map(fix, tree)


def load_checkpoint_sharded(path, abstract_state=None):
    """Restore an orbax checkpoint directory.

    Args:
      abstract_state: optional TrainState(-like) template whose ``params /
        batch_stats / opt_state / step`` carry the target shardings (e.g. the
        freshly created state already placed on the mesh).  When given, arrays
        are restored directly into those shardings; otherwise they come back
        as host arrays.

    Returns the same payload dict as the pickle loader.
    """
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if abstract_state is not None:
        abstract = {
            'params': abstract_state.params,
            'batch_stats': abstract_state.batch_stats,
            'opt_state': abstract_state.opt_state,
            'step': abstract_state.step,
        }
        def _abstractify(x):
            if hasattr(x, 'shape') and hasattr(x, 'dtype'):
                return jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=getattr(x, 'sharding', None))
            return x

        abstract = jax.tree_util.tree_map(_abstractify, abstract)
        restore_args = ocp.args.StandardRestore(abstract)
    else:
        restore_args = ocp.args.StandardRestore()
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        out = ckptr.restore(path, args=ocp.args.Composite(
            state=restore_args, meta=ocp.args.JsonRestore()))
    arrays = out['state']
    if jax.default_backend() == 'cpu':
        arrays = _reput_cpu_buffers(arrays)
    return {
        'params': arrays['params'],
        'batch_stats': arrays['batch_stats'],
        'opt_state': arrays['opt_state'],
        'step': arrays['step'],
        'meta': dict(out['meta'] or {}),
    }
