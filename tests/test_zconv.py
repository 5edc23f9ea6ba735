"""Conv3x3x3 z-decomposition == dense SAME conv (values and gradients).

The decomposition (necks3d._conv3z_same) skips the z-padding taps the dense
SAME conv multiplies by zero; it must stay numerically equivalent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from imvoxelnet_tpu.models import necks3d


@pytest.mark.parametrize('nz', [3, 4])
def test_conv3z_same_matches_dense(nz):
    """The decomposition itself (interior VALID-z conv + 2-tap boundaries)
    must equal the dense SAME conv regardless of the module's size gate."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 7, 6, nz, 5).astype(np.float32))
    kernel = jnp.asarray(0.3 * rng.randn(3, 3, 3, 5, 8).astype(np.float32))
    out = necks3d._conv3z_same(x, kernel)
    expected = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3x3_gate_decomposes_large_planes():
    """Conv3x3x3 routes large-plane shallow-z inputs through the
    decomposition (gate: nz in [3, 4] and nx*ny >= 16384) and everything
    else through the dense conv; both paths equal the dense result."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 128, 128, 3, 4).astype(np.float32))
    mod = necks3d.conv3(6)
    variables = mod.init(jax.random.PRNGKey(0), x)
    import flax.linen as fnn
    ref = fnn.Conv(6, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False)
    np.testing.assert_allclose(
        np.asarray(mod.apply(variables, x)),
        np.asarray(ref.apply(variables, x)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('nz', [3, 4, 6])
@pytest.mark.parametrize('stride', [1, 2])
def test_conv3x3x3_matches_dense(nz, stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 5, nz, 7).astype(np.float32))
    mod = necks3d.conv3(9, stride=stride)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(9, (3, 3, 3), strides=(stride,) * 3,
                  padding=((1, 1),) * 3, use_bias=False)
    out = mod.apply(variables, x)
    expected = ref.apply(variables, x)
    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3x3_gradients_match_dense():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 5, 3, 4).astype(np.float32))
    mod = necks3d.conv3(6)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(6, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False)
    cot = jnp.asarray(rng.randn(1, 5, 5, 3, 6).astype(np.float32))

    def loss(f):
        def inner(v, xx):
            return jnp.sum(f(v, xx) * cot)
        return inner

    g1 = jax.grad(loss(mod.apply), argnums=(0, 1))(variables, x)
    g2 = jax.grad(loss(ref.apply), argnums=(0, 1))(variables, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
