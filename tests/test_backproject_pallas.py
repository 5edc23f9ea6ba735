"""Pallas fused backprojection vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imvoxelnet_tpu.ops import backproject as bp


def _setup(v=3, hf=12, wf=16, c=8, seed=0):
    rng = np.random.RandomState(seed)
    features = rng.randn(v, hf, wf, c).astype(np.float32)
    projections = []
    for i in range(v):
        k = np.array([[20.0, 0, wf / 2], [0, 20.0, hf / 2], [0, 0, 1]],
                     np.float32)
        e = np.eye(4, dtype=np.float32)[:3]
        e[0, 3] = 0.2 * i
        projections.append(k @ e)
    points = np.asarray(
        bp.get_points((6, 6, 4), (0.3, 0.3, 0.3), jnp.asarray([0.0, 0.0, 2.0]))
    ).reshape(-1, 3)
    return features, points, np.stack(projections)


def test_pallas_matches_xla_interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    from imvoxelnet_tpu.ops import backproject_pallas as bpp

    features, points, projections = _setup()
    ref_vol, ref_seen = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections))

    with pltpu.force_tpu_interpret_mode():
        vol, seen = bpp.backproject_pallas(
            jnp.asarray(features), jnp.asarray(points),
            jnp.asarray(projections))
    np.testing.assert_array_equal(np.asarray(seen), np.asarray(ref_seen))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               atol=2e-2)
    assert np.asarray(seen).sum() > 0


def test_pallas_valid_hw_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from imvoxelnet_tpu.ops import backproject_pallas as bpp

    features, points, projections = _setup(v=1)
    ref_vol, ref_seen = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections),
        valid_hw=jnp.asarray([8, 8]))
    with pltpu.force_tpu_interpret_mode():
        vol, seen = bpp.backproject_pallas(
            jnp.asarray(features), jnp.asarray(points),
            jnp.asarray(projections), valid_hw=jnp.asarray([8, 8]))
    np.testing.assert_array_equal(np.asarray(seen), np.asarray(ref_seen))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol), atol=2e-2)
