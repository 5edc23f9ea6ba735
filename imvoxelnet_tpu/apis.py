"""High-level inference API.

Parity: ``mmdet3d/apis/inference.py:17-89`` (``init_detector`` /
``inference_detector``) — build a model from a preset, load a checkpoint
(native pkl or converted reference torch state_dict), and run single-scene
inference returning plain-array detections.
"""

from __future__ import annotations

import functools

import numpy as np


def init_detector(preset_name: str, checkpoint: str = None,
                  torch_checkpoint: str = None):
    """Build the model + variables for a named preset.

    Returns (preset, model, variables, forward_fn).
    """
    import jax

    from .configs.presets import get_preset
    from .models.detector import ImVoxelNet, imvoxelnet_predict
    from .utils import checkpoint as ckpt_lib

    preset = get_preset(preset_name)
    model = ImVoxelNet(preset.model)

    variables = None
    if torch_checkpoint:
        sd = ckpt_lib.load_torch_state_dict(torch_checkpoint)
        variables = ckpt_lib.convert_reference_checkpoint(sd, preset.model)
    elif checkpoint:
        payload = ckpt_lib.load_checkpoint(checkpoint)
        variables = {'params': payload['params'],
                     'batch_stats': payload['batch_stats']}

    use_pred_ext = preset.model.layout_head is not None

    @jax.jit
    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False,
                           use_predicted_extrinsics=use_pred_ext)
        return imvoxelnet_predict(preset.model, *outs, batch)

    return preset, model, variables, forward


def inference_detector(preset, model, variables, forward, images, intrinsic,
                       extrinsics, origin, ori_shape, img_shape):
    """Run one scene.

    Args:
      images: ``(V, H, W, 3)`` normalized + padded float32.
      intrinsic: ``(3, 3)``; extrinsics: ``(V, 4, 4)``; origin: ``(3,)``.
      ori_shape/img_shape: ``(2,)`` int (h, w).

    Returns dict(boxes (N, 7), scores (N,), labels (N,)).
    """
    import jax
    import jax.numpy as jnp

    batch = dict(
        images=jnp.asarray(images)[None],
        intrinsics=jnp.asarray(intrinsic, jnp.float32)[None],
        extrinsics=jnp.asarray(extrinsics, jnp.float32)[None],
        origins=jnp.asarray(origin, jnp.float32)[None],
        img_shape=jnp.asarray(img_shape, jnp.int32)[None],
        ratios=jnp.asarray(
            [float(ori_shape[0]) / (float(img_shape[0]) / 4.0)], jnp.float32),
    )
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = jax.device_get(forward(variables, batch))
    valid = out['valid'][0]
    res = dict(boxes=out['boxes'][0][valid], scores=out['scores'][0][valid],
               labels=out['labels'][0][valid])
    if 'angles' in out:
        res['angles'] = out['angles'][0]
        res['layout'] = out['layout'][0]
    return res
