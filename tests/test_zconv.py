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
