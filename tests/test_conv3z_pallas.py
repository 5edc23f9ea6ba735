"""Lane-packed shallow-z conv kernel vs the XLA conv it replaces.

Interpret-mode on the CPU mesh; the hardware microbench lives in
``tools/bench_conv3z.py`` (numbers in docs/performance.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imvoxelnet_tpu.ops.conv3z_pallas import _conv_ref, conv3z_lanepack


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize('shape,tile', [
    # (B, nx, ny, nz, cin, cout), (tx, ty) — dividing and ragged edges
    ((2, 8, 8, 5, 8, 8), (4, 4)),
    ((1, 6, 7, 4, 8, 16), (4, 4)),   # ragged nx and ny
    ((1, 9, 5, 12, 16, 8), (4, 4)),  # kitti-like nz
])
def test_matches_xla_conv(shape, tile):
    b, nx, ny, nz, cin, cout = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = _rand(k1, (b, nx, ny, nz, cin))
    w = _rand(k2, (3, 3, 3, cin, cout)) * 0.1
    got = conv3z_lanepack(x, w, *tile)
    want = _conv_ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_matches_xla_conv_bf16():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(k1, (1, 8, 9, 6, 8), jnp.bfloat16)
    w = (_rand(k2, (3, 3, 3, 8, 8)) * 0.1).astype(jnp.bfloat16)
    got = np.asarray(conv3z_lanepack(x, w, 4, 4)).astype(np.float32)
    want = np.asarray(_conv_ref(x, w)).astype(np.float32)
    # both accumulate fp32; order differs -> tolerance, not bit equality
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gradients_are_the_xla_conv_transpose():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(k1, (1, 6, 6, 4, 8))
    w = _rand(k2, (3, 3, 3, 8, 8)) * 0.1
    ct = _rand(k3, (1, 6, 6, 4, 8))

    def loss_kernel(x_, w_):
        return jnp.sum(conv3z_lanepack(x_, w_, 4, 4) * ct)

    def loss_ref(x_, w_):
        return jnp.sum(_conv_ref(x_, w_) * ct)

    gx, gw = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-6)


def test_neck_gate_routes_block0(monkeypatch):
    """Conv3x3x3 takes the lane-packed path only for lane-bound shapes."""
    monkeypatch.setenv('IMVOXELNET_TPU_CONV3Z_PALLAS', '1')
    from imvoxelnet_tpu.models import necks3d

    called = {}
    real = necks3d.conv3z_lanepack

    def spy(x, w, *a, **kw):
        called['shape'] = x.shape
        return real(x, w, *a, **kw)

    monkeypatch.setattr(necks3d, 'conv3z_lanepack', spy)
    conv = necks3d.Conv3x3x3(features=64)
    # KITTI block0-like (plane large, 64ch) but tiny for CPU: fake the
    # plane-size gate by monkeypatching the threshold
    monkeypatch.setattr(necks3d, '_CONV3Z_MIN_PLANE', 64)
    x = jnp.ones((1, 8, 8, 12, 64), jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply(variables, x)
    assert called['shape'] == x.shape
    assert y.shape == (1, 8, 8, 12, 64)
    # numerically the same conv
    want = _conv_ref(x.astype(jnp.float32),
                     variables['params']['kernel'].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
