"""Train-step + multi-device mesh tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from imvoxelnet_tpu.models.detector import ImVoxelNet
from imvoxelnet_tpu.parallel import mesh as mesh_lib
from imvoxelnet_tpu.parallel import train as train_lib

from test_models import _make_batch, _tiny_kitti_cfg


def test_train_step_single_device():
    cfg = _tiny_kitti_cfg()
    batch = _make_batch(b=1)
    model = ImVoxelNet(cfg)
    tx = train_lib.make_optimizer(1e-4, 1e-4, 0.1, 35.0, steps_per_epoch=10)
    state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(train_lib.make_train_step(model, tx))

    before = state.params['backbone']['conv1']['kernel']
    before_head = state.params['bbox_head']['conv_cls']['kernel']
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    # frozen stem must not move; head must move
    np.testing.assert_array_equal(
        np.asarray(before), np.asarray(state2.params['backbone']['conv1']['kernel']))
    assert not np.allclose(
        np.asarray(before_head),
        np.asarray(state2.params['bbox_head']['conv_cls']['kernel']))


def test_param_labels():
    cfg = _tiny_kitti_cfg()
    batch = _make_batch(b=1)
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    labels = train_lib.param_labels(variables['params'])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {}
    for path, lab in flat:
        keys = tuple(getattr(k, 'key', str(k)) for k in path)
        seen.setdefault(lab, []).append(keys)
    # stem frozen, deep backbone convs trainable at 0.1, heads at 1.0
    assert any(k[:2] == ('backbone', 'conv1') for k in seen['frozen'])
    assert any(k[0] == 'backbone' and k[1].startswith('layer3')
               for k in seen['backbone'])
    assert all(k[0] != 'backbone' for k in seen['rest'])
    # all backbone BN params are frozen
    for path, lab in flat:
        keys = [getattr(k, 'key', str(k)) for k in path]
        if keys[0] == 'backbone' and any('bn' in k for k in keys[1:]):
            assert lab == 'frozen', keys


def test_train_step_8device_mesh():
    """The dryrun_multichip analog: one DP step on an 8-way CPU mesh."""
    assert len(jax.devices()) == 8
    cfg = _tiny_kitti_cfg()
    batch = _make_batch(b=8)
    model = ImVoxelNet(cfg)
    tx = train_lib.make_optimizer(1e-4, 1e-4, 0.1, 35.0, steps_per_epoch=10)
    state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    mesh = mesh_lib.make_mesh()
    rep = mesh_lib.replicated(mesh)
    state = jax.device_put(state, rep)
    batch = mesh_lib.shard_batch(batch, mesh)

    step = jax.jit(
        train_lib.make_train_step(model, tx),
        in_shardings=(rep, mesh_lib.batch_sharding(mesh)),
        out_shardings=(rep, rep))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    # params stay replicated
    k = state2.params['bbox_head']['conv_cls']['kernel']
    assert len(k.sharding.device_set) == 8

    # --- numerical equivalence: the 8-device GSPMD step must EQUAL the same
    # global batch on one device (the reference's DDP gradient-averaging +
    # reduce_mean semantics), not merely stay finite.
    dev0 = jax.devices()[0]
    state_1 = jax.device_put(state, jax.sharding.SingleDeviceSharding(dev0))
    batch_1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), dev0), batch)
    step_1 = jax.jit(train_lib.make_train_step(model, tx))
    state2_1, metrics_1 = step_1(state_1, batch_1)
    np.testing.assert_allclose(float(metrics['loss']),
                               float(metrics_1['loss']),
                               rtol=1e-5, atol=1e-6)
    # Param tolerance must discriminate a SEMANTICS bug from rounding noise:
    # f32 all-reduce ordering differs between the 1- and 8-device psum trees,
    # and Adam's g/(sqrt(v)+eps) amplifies it on near-zero-gradient elements
    # (observed: isolated diffs up to ~7e-5 on <0.5% of a layer's elements).
    # A real divergence (e.g. missing gradient averaging) shifts entire
    # layers by ~lr=1e-4 per element, so assert the MEAN abs diff per layer
    # stays 10x below that while bounding the worst element (small bias
    # vectors can carry a few ~5e-6 noisy elements, so the mean threshold
    # cannot be much tighter).
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state2.params)[0],
            jax.tree_util.tree_flatten_with_path(state2_1.params)[0]):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        assert d.mean() < 1e-5, (str(path), d.mean())
        assert d.max() < 3e-4, (str(path), d.max())
