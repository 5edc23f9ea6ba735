"""High-level API smoke tests (reference ``tests/test_apis.py`` analog).

The reference exercises ``init_detector``/``inference_detector`` on real
checkpoints; in-container we assert the same contract on the tiny preset
with random weights: construction, single-scene inference, checkpoint
round-trip through the API, and output-dict structure.
"""

import os

import numpy as np

from imvoxelnet_tpu import apis


def _synthetic_scene(h=96, w=320):
    rng = np.random.RandomState(0)
    images = rng.uniform(-2, 2, (1, h, w, 3)).astype(np.float32)
    intrinsic = np.array([[200., 0., w / 2],
                          [0., 200., h / 2],
                          [0., 0., 1.]], np.float32)
    extrinsics = np.eye(4, dtype=np.float32)[None]
    origin = np.array([0., 0., 0.], np.float32)
    ori_shape = (h, w)
    img_shape = (h, w)
    return images, intrinsic, extrinsics, origin, ori_shape, img_shape


def test_init_and_inference_detector():
    preset, model, variables, forward = apis.init_detector('tiny_kitti_test')
    assert variables is None  # no checkpoint -> random init inside inference
    res = apis.inference_detector(preset, model, variables, forward,
                                  *_synthetic_scene())
    assert set(res) >= {'boxes', 'scores', 'labels'}
    assert res['boxes'].ndim == 2 and res['boxes'].shape[1] == 7
    assert res['scores'].shape[0] == res['boxes'].shape[0]
    assert res['labels'].shape[0] == res['boxes'].shape[0]
    assert np.all(np.isfinite(res['boxes']))
    # scores kept by NMS are in (0, 1]
    if res['scores'].size:
        assert res['scores'].min() > 0.0


def test_init_detector_native_checkpoint_roundtrip(tmp_path):
    import jax

    from imvoxelnet_tpu.utils import checkpoint as ckpt_lib

    preset, model, variables, forward = apis.init_detector('tiny_kitti_test')
    scene = _synthetic_scene()

    # materialise random weights the same way inference_detector does
    import jax.numpy as jnp
    images, intrinsic, extrinsics, origin, ori_shape, img_shape = scene
    batch = dict(
        images=jnp.asarray(images)[None],
        intrinsics=jnp.asarray(intrinsic)[None],
        extrinsics=jnp.asarray(extrinsics)[None],
        origins=jnp.asarray(origin)[None],
        img_shape=jnp.asarray(img_shape, jnp.int32)[None],
        ratios=jnp.asarray([float(ori_shape[0]) / (img_shape[0] / 4.0)],
                           jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    path = os.path.join(tmp_path, 'ckpt.pkl')
    from types import SimpleNamespace
    ckpt_lib.save_checkpoint(path, SimpleNamespace(
        params=variables['params'], batch_stats=variables['batch_stats'],
        opt_state={}, step=7))

    preset2, model2, variables2, forward2 = apis.init_detector(
        'tiny_kitti_test', checkpoint=path)
    assert variables2 is not None
    res_a = apis.inference_detector(preset, model, variables, forward, *scene)
    res_b = apis.inference_detector(preset2, model2, variables2, forward2,
                                    *scene)
    np.testing.assert_allclose(res_a['boxes'], res_b['boxes'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res_a['scores'], res_b['scores'],
                               rtol=1e-5, atol=1e-5)
