"""bf16 compute-path smoke: outputs close to fp32, params still fp32."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.models.detector import ImVoxelNet

from test_models import _make_batch, _tiny_kitti_cfg


def test_bf16_forward_close_to_fp32():
    cfg32 = _tiny_kitti_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype='bfloat16')
    batch = _make_batch(b=1)

    m32 = ImVoxelNet(cfg32)
    variables = m32.init(jax.random.PRNGKey(0), batch, train=False)
    # same variables drive both models (dtype is compute-only)
    out32 = m32.apply(variables, batch, train=False)
    m16 = ImVoxelNet(cfg16)
    out16 = m16.apply(variables, batch, train=False)

    for a, b in zip(out32[0], out16[0]):
        assert b.dtype == jnp.float32      # heads cast back to fp32
        diff = np.abs(np.asarray(a) - np.asarray(b))
        scale = np.abs(np.asarray(a)).mean() + 1e-3
        assert diff.mean() / scale < 0.2, diff.mean() / scale

    leaves = jax.tree_util.tree_leaves(variables['params'])
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
