import copy
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from fuse_conv_bn import fuse_backbone  # noqa: E402

from imvoxelnet_tpu.models.resnet import resnet50  # noqa: E402


def test_fused_backbone_same_outputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    model = resnet50()
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomize the BN stats so fusion is non-trivial
    params = jax.tree_util.tree_map(np.asarray, variables['params'])

    def jitter(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                jitter(v)
            elif k in ('mean',):
                tree[k] = v + rng.randn(*v.shape).astype(np.float32) * 0.1
            elif k in ('var',):
                tree[k] = v * (1 + rng.rand(*v.shape).astype(np.float32))
            elif k in ('scale', 'bias') and v.ndim == 1:
                tree[k] = v + rng.randn(*v.shape).astype(np.float32) * 0.1

    jitter(params)
    ref = model.apply({'params': params}, x)

    fused = fuse_backbone({'backbone': copy.deepcopy(params)})['backbone']
    out = model.apply({'params': fused}, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
