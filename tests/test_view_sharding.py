"""View-parallel backprojection over an 8-device mesh must match single-chip."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from imvoxelnet_tpu.ops import backproject as bp


def test_view_sharded_backproject_matches():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ('view',))

    rng = np.random.RandomState(0)
    v, hf, wf, c = 16, 12, 16, 8    # 16 views -> 2 per device
    features = rng.randn(v, hf, wf, c).astype(np.float32)
    projections = []
    for i in range(v):
        k = np.array([[20.0, 0, wf / 2], [0, 20.0, hf / 2], [0, 0, 1]],
                     np.float32)
        e = np.eye(4, dtype=np.float32)[:3]
        e[0, 3] = 0.1 * i
        projections.append(k @ e)
    projections = np.stack(projections)
    points = np.asarray(bp.get_points(
        (6, 6, 4), (0.3, 0.3, 0.3), jnp.asarray([0.0, 0.0, 2.0]))
    ).reshape(-1, 3)
    valid_hw = jnp.asarray([hf, wf], jnp.int32)

    ref_vol, ref_seen = bp.backproject(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections),
        valid_hw)

    sharded = shard_map(
        functools.partial(bp.backproject_view_sharded, axis_name='view'),
        mesh=mesh,
        in_specs=(P('view'), P(), P('view'), P()),
        out_specs=(P(), P()),
    )
    vol, seen = jax.jit(sharded)(
        jnp.asarray(features), jnp.asarray(points), jnp.asarray(projections),
        valid_hw)

    np.testing.assert_array_equal(np.asarray(seen), np.asarray(ref_seen))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(ref_vol),
                               atol=1e-5)
    assert np.asarray(seen).sum() > 0
