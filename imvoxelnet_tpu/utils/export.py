"""Ahead-of-time serving export: the jitted forward as a StableHLO artifact.

The reference deploys by loading a torch checkpoint into a Python runtime
(``mmdet3d/apis/inference.py:17-45`` ``init_detector``), so serving always
drags the full model zoo, config system and Python along.  The TPU-native
serving analog is an ahead-of-time export: ``jax.export`` lowers the jitted
``simple_test`` forward once per target platform and serializes one
self-describing StableHLO module that a JAX-less runtime (PjRt C API
consumers, TensorFlow ``XlaCallModule``, IFRT serving proxies) can load,
compile and execute without the Python model code.

Two weight conventions:

* **weights as inputs** (default) — the artifact holds only the program;
  the serving runtime feeds the param pytree alongside the batch.  Params
  hot-swap without re-exporting.
* **weights baked** (``bake_variables=True``) — params are closed over and
  become module constants; a single file deploys, at the cost of artifact
  size and a re-export per checkpoint.

Outputs are the fixed-shape detection dict of ``imvoxelnet_predict``
(boxes/scores/labels padded to ``max_out``), so the serving contract is
static — no host-side shape negotiation.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np


def serving_batch_spec(data_cfg, model_cfg, batch_size=1):
    """ShapeDtypeStructs of the inference batch for a preset's test geometry.

    Mirrors the batch layout of ``apis.inference_detector`` /
    ``__graft_entry__._kitti_batch``: images come normalized + padded at the
    preset's ``test_size``; one shared intrinsic per scene; per-view
    extrinsics; metric grid origin; valid (h, w); resize ratio.

    ``batch_size=None`` exports batch-polymorphic: the leading dim becomes
    the symbolic ``b`` (``jax.export.symbolic_shape``), so ONE artifact
    serves any batch size — the serving runtime specializes at compile time.
    Everything per-scene (grid, anchors, NMS) is batched, so the whole
    detection graph stays shape-polymorphic in ``b``.
    """
    import jax

    w, h = data_cfg.test_size
    v = data_cfg.n_images_test
    if batch_size is None:
        from jax import export as jexport
        b = jexport.symbolic_shape('b')[0]
    else:
        b = batch_size
    f32, i32 = np.float32, np.int32
    spec = jax.ShapeDtypeStruct
    return dict(
        images=spec((b, v, h, w, 3), f32),
        intrinsics=spec((b, 3, 3), f32),
        extrinsics=spec((b, v, 4, 4), f32),
        origins=spec((b, 3), f32),
        img_shape=spec((b, 2), i32),
        ratios=spec((b,), f32),
    )


def make_serving_fn(model_cfg, view_mesh=None):
    """The (variables, batch) -> detections function that gets exported.

    Identical composition to ``apis.init_detector``'s jitted forward:
    ``ImVoxelNet.apply(train=False)`` + ``imvoxelnet_predict`` (decode +
    NMS in-graph, fixed-size outputs).

    With ``view_mesh`` (a 1-D ``jax.sharding.Mesh``) the forward runs
    view-sharded: backbone + FPN + voxel gather on each device's view
    shard, psum-pooled volume, replicated neck/head — the multi-chip
    serving composition for the 50-view ScanNet test.  The artifact then
    records ``nr_devices == mesh.size`` and must be called with
    mesh-committed arguments (images/extrinsics sharded over the view
    axis).  Mathematically identical to the unsharded detector.
    """
    import dataclasses

    from ..models.detector import ImVoxelNet, imvoxelnet_predict

    if view_mesh is not None:
        from ..parallel import mesh as mesh_lib

        axis = view_mesh.axis_names[0]
        model_sh = ImVoxelNet(
            dataclasses.replace(model_cfg, view_shard_axis=axis))
        sharded_apply = mesh_lib.view_sharded_forward(
            model_sh, view_mesh, axis_name=axis)

        def forward_sharded(variables, batch):
            outs = sharded_apply(variables, batch)
            return imvoxelnet_predict(model_cfg, *outs, batch)

        return forward_sharded

    model = ImVoxelNet(model_cfg)
    use_pred_ext = model_cfg.layout_head is not None

    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False,
                           use_predicted_extrinsics=use_pred_ext)
        return imvoxelnet_predict(model_cfg, *outs, batch)

    return forward


def export_serving(model_cfg, batch_spec, variables,
                   platforms: Optional[Sequence[str]] = None,
                   bake_variables: bool = False,
                   view_mesh=None, data_mesh=None):
    """Export the serving forward; returns a ``jax.export.Exported``.

    Args:
      batch_spec: pytree of ``ShapeDtypeStruct`` (see ``serving_batch_spec``).
      variables: the model variable pytree.  With ``bake_variables`` they are
        embedded as constants; otherwise only their shapes/dtypes shape the
        calling convention and the exported module takes ``(variables,
        batch)``.
      platforms: lowering targets, e.g. ``('tpu', 'cpu')``.  ``None`` lowers
        for the current default backend only.  Cross-platform lowering needs
        no target hardware — it is the point of the artifact.
      view_mesh: optional 1-D mesh for a multi-device view-sharded artifact
        (see ``make_serving_fn``).
      data_mesh: optional 1-D mesh for a throughput-serving artifact: the
        batch axis GSPMD-sharded over the mesh, params replicated, outputs
        batch-sharded.  Mutually exclusive with ``view_mesh``; call with
        mesh-committed arguments.

    Note: Pallas-gated fast paths (``ops/iou.py:_use_pallas``) select by the
    default backend at trace time; a cross-platform export therefore always
    traces the pure-XLA path, which is the portable (and for the shipped
    presets, the actually-taken) one.
    """
    import jax
    from jax import export as jexport

    assert view_mesh is None or data_mesh is None, (
        'view_mesh and data_mesh are mutually exclusive')
    fn = make_serving_fn(model_cfg, view_mesh=view_mesh)

    def jit_with_shardings(f, n_batch_args):
        if data_mesh is None:
            return jax.jit(f)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(data_mesh, P())
        dp = jax.tree_util.tree_map(
            lambda _: NamedSharding(data_mesh, P(data_mesh.axis_names[0])),
            batch_spec)
        in_sh = (dp,) if n_batch_args == 1 else (rep, dp)
        return jax.jit(f, in_shardings=in_sh, out_shardings=dp['images'])

    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = list(platforms)
    if bake_variables:
        baked = jax.tree_util.tree_map(np.asarray, variables)
        return jexport.export(
            jit_with_shardings(functools.partial(fn, baked), 1),
            **kwargs)(batch_spec)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    return jexport.export(jit_with_shardings(fn, 2),
                          **kwargs)(var_spec, batch_spec)


def save_exported(exported, path: str) -> int:
    """Serialize to ``path``; returns the byte size."""
    data = bytes(exported.serialize())
    with open(path, 'wb') as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Deserialize an artifact; run it via ``loaded.call(*args)``."""
    from jax import export as jexport

    with open(path, 'rb') as f:
        return jexport.deserialize(bytearray(f.read()))
