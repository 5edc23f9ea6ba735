"""DCNv2 tests: zero-offset equivalence with a plain conv + gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.models.dcn import DeformConv2d, bilinear_sample


def test_bilinear_sample_exact_on_grid():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(5, 6, 3).astype(np.float32))
    x = jnp.asarray([[1.0, 2.0], [0.0, 5.0]])
    y = jnp.asarray([[0.0, 3.0], [4.0, 0.0]])
    out = np.asarray(bilinear_sample(feat, x, y))
    np.testing.assert_allclose(out[0, 0], np.asarray(feat)[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[1, 1], np.asarray(feat)[0, 5], atol=1e-6)


def test_bilinear_sample_midpoint():
    feat = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0).at[1, 1, 0].set(3.0)
    out = float(bilinear_sample(feat, jnp.asarray([0.5]), jnp.asarray([0.5]))[0, 0])
    np.testing.assert_allclose(out, (1.0 + 0 + 0 + 3.0) / 4, atol=1e-6)


def test_dcn_zero_offsets_equals_plain_conv():
    """conv_offset initialises to zero -> sigmoid(mask)=0.5, offsets=0: the
    output must equal 0.5x a plain 3x3 conv with the same kernel."""
    import flax.linen as nn
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    dcn = DeformConv2d(6)
    variables = dcn.init(jax.random.PRNGKey(0), x)
    out = dcn.apply(variables, x)

    kernel = variables['params']['kernel']
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_dcn_stride2_shape_and_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))
    dcn = DeformConv2d(6, stride=2)
    variables = dcn.init(jax.random.PRNGKey(0), x)
    out = dcn.apply(variables, x)
    assert out.shape == (1, 4, 5, 6)

    def loss(params):
        return jnp.sum(dcn.apply({'params': params}, x) ** 2)

    grads = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # offset conv gets gradient through the bilinear sampling
    g_off = np.asarray(grads['conv_offset']['kernel'])
    assert np.abs(g_off).sum() > 0
