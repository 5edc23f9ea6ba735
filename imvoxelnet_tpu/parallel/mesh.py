"""Device mesh + sharding helpers (SURVEY.md §2.4).

The reference's only training parallelism is NCCL data-parallel DDP
(``tools/dist_train.sh``, ``tools/train.py:97-102``).  Here the equivalent is
a 1-D ``data`` mesh with GSPMD: the batch is sharded over ``data``, parameters
are replicated, and XLA inserts the gradient all-reduce and makes batch-norm
statistics and loss normalisers *global* means (a strict upgrade over per-GPU
BN at batch 1-4).  The mesh is built N-D-ready so tensor axes can be added
later without touching the step function.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) axis of every leaf over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def view_sharded_forward(model, mesh: Mesh, axis_name: str = 'view'):
    """Jitted inference forward with the VIEW axis sharded over ``mesh`` —
    the sequence-parallel analog SURVEY.md §5 names for the 50-view ScanNet
    test (``imvoxelnet_scannet.py:66``).

    Each device runs backbone + FPN + the voxel gather on its local view
    shard; the per-voxel (sum, count) pair is ``psum``-ed over ICI; the 3D
    neck and head then run replicated on the pooled volume (cheap next to
    the 50-view backbone).  Mathematically identical to the unsharded
    detector — exact-match tested in ``tests/test_view_sharding.py``.

    The model's config must set ``view_shard_axis == axis_name``
    (e.g. ``dataclasses.replace(preset.model, view_shard_axis='view')``).
    Requires the global view count to be divisible by the mesh size.
    """
    assert model.cfg.view_shard_axis == axis_name, (
        'set ImVoxelNetConfig.view_shard_axis to run view-sharded')

    def fwd(variables, batch):
        sharded_keys = {'images', 'extrinsics'}
        batch_specs = {k: (P(None, axis_name) if k in sharded_keys else P())
                       for k in batch}
        f = _shard_map(
            lambda v, b: model.apply(v, b, train=False),
            mesh, in_specs=(P(), batch_specs), out_specs=P())
        return f(variables, batch)

    return jax.jit(fwd)
