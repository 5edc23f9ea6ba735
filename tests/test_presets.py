"""Build every named preset's model abstractly (the TPU analog of the
reference's ``tests/test_config.py:19-74``, which constructs every shipped
config).  ``jax.eval_shape`` traces init + forward without executing, so all
14 presets are validated at their real shapes in seconds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imvoxelnet_tpu.configs.presets import PRESETS
from imvoxelnet_tpu.models.detector import ImVoxelNet


def _abstract_batch(preset, train):
    d = preset.data
    w, h = d.test_size
    v = d.n_images_test
    b = 1
    batch = dict(
        images=jnp.zeros((b, v, h, w, 3), jnp.float32),
        intrinsics=jnp.zeros((b, 3, 3), jnp.float32),
        extrinsics=jnp.zeros((b, v, 4, 4), jnp.float32),
        origins=jnp.zeros((b, 3), jnp.float32),
        img_shape=jnp.tile(jnp.asarray([h, w], jnp.int32), (b, 1)),
        ratios=jnp.ones((b,), jnp.float32),
    )
    if train:
        batch.update(
            gt_boxes=jnp.zeros((b, d.max_gt, 7), jnp.float32),
            gt_labels=jnp.zeros((b, d.max_gt), jnp.int32),
            gt_mask=jnp.zeros((b, d.max_gt), bool))
        if preset.model.layout_head is not None:
            batch['gt_angles'] = jnp.zeros((b, 2), jnp.float32)
            batch['gt_layout'] = jnp.zeros((b, 7), jnp.float32)
    return batch


@pytest.mark.parametrize('name', sorted(PRESETS))
def test_preset_builds_and_traces(name):
    preset = PRESETS[name]
    model = ImVoxelNet(preset.model)
    batch = _abstract_batch(preset, train=False)
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch)
    assert 'params' in shapes
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree_util.tree_leaves(shapes['params']))
    assert n_params > 20_000_000  # ResNet-50 alone is ~23.5M

    def fwd(b):
        variables = model.init(jax.random.PRNGKey(0), b, train=False)
        return model.apply(variables, b, train=False)

    outs = jax.eval_shape(fwd, batch)
    head_outs, valid, _ = outs
    assert tuple(valid.shape[1:]) == tuple(preset.model.n_voxels)
    if preset.model.head_kind == 'indoor':
        assert len(head_outs[0]) == 3
        # level 0 has the full voxel resolution
        assert tuple(head_outs[0][0].shape[1:4]) == tuple(preset.model.n_voxels)
    else:
        # BEV map (ny-2, nx-2) after the z-collapsing neck (KITTI) or
        # ((ny/2)-?, ...) for nuScenes' stride-2 first conv
        assert head_outs[0].ndim == 4


def test_apply_overrides_nested_and_types():
    """--override surface (the reference --options analog,
    ``tools/train.py:48-49,71-72``): dotted paths through nested frozen
    dataclasses, literal parsing, unknown-field rejection."""
    import pytest
    from imvoxelnet_tpu.configs.presets import apply_overrides, get_preset

    p = get_preset('imvoxelnet_sunrgbd_fast')
    q = apply_overrides(p, [
        'model.indoor_head.score_thr=0.1',
        'model.indoor_head.pre_nms_k=0',
        'data.repeat_times=1',
        'lr_steps=(9, 11)',
        'model.compute_dtype=bfloat16',     # bare string
    ])
    assert q.model.indoor_head.score_thr == 0.1
    assert q.model.indoor_head.pre_nms_k == 0
    assert q.data.repeat_times == 1
    assert q.lr_steps == (9, 11)
    assert q.model.compute_dtype == 'bfloat16'
    # original untouched (frozen dataclasses, replace-based)
    assert p.model.indoor_head.score_thr == 0.0
    with pytest.raises(AttributeError):
        apply_overrides(p, ['model.indoor_head.scor_thr=0.1'])
    with pytest.raises(AttributeError):
        # cannot descend into a None child (kitti preset has no indoor head)
        apply_overrides(get_preset('imvoxelnet_kitti'),
                        ['model.indoor_head.score_thr=0.1'])
    with pytest.raises(ValueError):
        apply_overrides(p, ['model.indoor_head.score_thr'])
