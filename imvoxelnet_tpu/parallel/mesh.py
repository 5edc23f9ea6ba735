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
