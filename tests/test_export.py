"""Serving export: the StableHLO artifact reproduces the direct forward.

The exported module (``utils/export.py``) is the deployment analog of the
reference's ``init_detector``-based serving (``mmdet3d/apis/inference.py``):
these tests pin that a serialized artifact, deserialized with no model code
in scope, returns the same detections as ``ImVoxelNet.apply`` +
``imvoxelnet_predict`` — for both weight conventions — and that the CLI
plumbing reports a sane manifest.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import export as export_cli  # noqa: E402

from __graft_entry__ import _kitti_batch  # noqa: E402
from imvoxelnet_tpu.configs import presets as presets_mod  # noqa: E402
from imvoxelnet_tpu.models.detector import ImVoxelNet  # noqa: E402
from imvoxelnet_tpu.utils import export as export_lib  # noqa: E402
from test_models import _tiny_indoor_cfg, _tiny_kitti_cfg  # noqa: E402


def _specs_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


@pytest.fixture(scope='module')
def tiny_model():
    cfg = _tiny_kitti_cfg()
    batch = _kitti_batch(b=1, v=1, h=64, w=64)
    variables = ImVoxelNet(cfg).init(jax.random.PRNGKey(0), batch,
                                     train=False)
    return cfg, batch, variables


def test_roundtrip_weights_as_inputs(tiny_model, tmp_path):
    cfg, batch, variables = tiny_model
    exported = export_lib.export_serving(cfg, _specs_of(batch), variables)
    path = str(tmp_path / 'm.stablehlo')
    size = export_lib.save_exported(exported, path)
    assert size > 0

    loaded = export_lib.load_exported(path)
    got = loaded.call(variables, batch)
    want = export_lib.make_serving_fn(cfg)(variables, batch)
    assert set(got) == set(want)
    assert {'boxes', 'scores', 'labels'} <= set(got)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_roundtrip_baked_weights(tiny_model, tmp_path):
    cfg, batch, variables = tiny_model
    exported = export_lib.export_serving(cfg, _specs_of(batch), variables,
                                         bake_variables=True)
    path = str(tmp_path / 'baked.stablehlo')
    export_lib.save_exported(exported, path)
    loaded = export_lib.load_exported(path)
    got = loaded.call(batch)  # no variables at call time
    want = export_lib.make_serving_fn(cfg)(variables, batch)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_cross_platform_lowering(tiny_model):
    """A tpu+cpu artifact lowers from the CPU host (no TPU needed)."""
    cfg, batch, variables = tiny_model
    exported = export_lib.export_serving(
        cfg, _specs_of(batch), variables, platforms=('tpu', 'cpu'))
    assert set(exported.platforms) == {'tpu', 'cpu'}
    # still executable on the CPU side of the artifact
    got = jax.export.deserialize(exported.serialize()).call(variables, batch)
    want = export_lib.make_serving_fn(cfg)(variables, batch)
    np.testing.assert_allclose(np.asarray(got['scores']),
                               np.asarray(want['scores']),
                               rtol=1e-5, atol=1e-5)


def test_indoor_layout_outputs(tmp_path):
    """Total3D-style graphs export their extra angle/layout outputs."""
    cfg = _tiny_indoor_cfg(layout=True)
    batch = _kitti_batch(b=1, v=1, h=64, w=64)
    variables = ImVoxelNet(cfg).init(jax.random.PRNGKey(0), batch,
                                     train=False)
    exported = export_lib.export_serving(cfg, _specs_of(batch), variables)
    out = jax.tree_util.tree_unflatten(exported.out_tree,
                                       exported.out_avals)
    assert {'boxes', 'scores', 'labels', 'angles', 'layout'} <= set(out)


def test_poly_batch_serves_multiple_batch_sizes(tiny_model, tmp_path):
    """One symbolic-batch artifact runs b=1 and b=3 and matches direct."""
    cfg, _, variables = tiny_model
    b = jax.export.symbolic_shape('b')[0]
    one = _kitti_batch(b=1, v=1, h=64, w=64)
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype), one)
    exported = export_lib.export_serving(cfg, spec, variables)
    path = str(tmp_path / 'poly.stablehlo')
    export_lib.save_exported(exported, path)
    loaded = export_lib.load_exported(path)
    fn = export_lib.make_serving_fn(cfg)
    for bs in (1, 3):
        batch = _kitti_batch(b=bs, v=1, h=64, w=64)
        got = loaded.call(variables, batch)
        want = fn(variables, batch)
        assert got['boxes'].shape[0] == bs
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('preset_name', [
    'imvoxelnet_kitti',            # anchor3d graph
    'imvoxelnet_nuscenes',         # DCN backbone
    'imvoxelnet_sunrgbd',          # indoor v1 head
    'imvoxelnet_scannet_fast',     # fast neck, v2 head, 50-view
    'imvoxelnet_total_sunrgbd',    # layout head (+angles/layout outputs)
])
def test_full_preset_graph_lowers_for_tpu(preset_name):
    """Every production graph family exports poly-batch for tpu+cpu.

    Spec-only (eval_shape init + trace + lowering, no execution), so this
    pins that the FULL flagship graphs — not just tiny replicas — are
    exportable serving artifacts; sizes/latencies in docs/design.md.
    """
    batch_lib = pytest.importorskip('__graft_entry__')
    preset = presets_mod.get_preset(preset_name)
    model = ImVoxelNet(preset.model)
    w, h = preset.data.test_size
    batch = batch_lib._kitti_batch(1, preset.data.n_images_test, h, w)
    variables = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch)
    spec = export_lib.serving_batch_spec(preset.data, preset.model, None)
    exported = export_lib.export_serving(preset.model, spec, variables,
                                         platforms=('tpu', 'cpu'))
    assert set(exported.platforms) == {'tpu', 'cpu'}
    out = jax.tree_util.tree_unflatten(exported.out_tree, exported.out_avals)
    assert {'boxes', 'scores', 'labels'} <= set(out)
    assert len(bytes(exported.serialize())) > 0


def test_view_sharded_export_roundtrip(tmp_path):
    """An 8-device view-sharded artifact matches the unsharded detector."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imvoxelnet_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_indoor_cfg(dataset='scannet', fast=True)
    batch = _kitti_batch(b=1, v=8, h=64, w=64)
    variables = ImVoxelNet(cfg).init(jax.random.PRNGKey(0), batch,
                                     train=False)
    vmesh = mesh_lib.make_mesh(axis_name='view')
    assert vmesh.size == 8  # conftest's virtual CPU mesh
    exported = export_lib.export_serving(
        cfg, _specs_of(batch), variables, view_mesh=vmesh)
    assert exported.nr_devices == 8
    path = str(tmp_path / 'sharded.stablehlo')
    export_lib.save_exported(exported, path)
    loaded = export_lib.load_exported(path)

    rep = NamedSharding(vmesh, P())
    v_dev = jax.device_put(variables, rep)
    b_dev = {k: jax.device_put(
        v, NamedSharding(vmesh, P(None, 'view'))
        if k in ('images', 'extrinsics') else rep)
        for k, v in batch.items()}
    got = jax.jit(loaded.call)(v_dev, b_dev)
    want = export_lib.make_serving_fn(cfg)(variables, batch)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_data_sharded_export_roundtrip(tiny_model, tmp_path):
    """A GSPMD batch-sharded artifact matches the single-device forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imvoxelnet_tpu.parallel import mesh as mesh_lib

    cfg, _, variables = tiny_model
    batch = _kitti_batch(b=8, v=1, h=64, w=64)
    mesh = mesh_lib.make_mesh(axis_name='data')
    exported = export_lib.export_serving(
        cfg, _specs_of(batch), variables, data_mesh=mesh)
    assert exported.nr_devices == 8
    path = str(tmp_path / 'dp.stablehlo')
    export_lib.save_exported(exported, path)
    loaded = export_lib.load_exported(path)

    dp = NamedSharding(mesh, P('data'))
    v_dev = jax.device_put(variables, NamedSharding(mesh, P()))
    b_dev = jax.tree_util.tree_map(lambda x: jax.device_put(x, dp), batch)
    got = jax.jit(loaded.call)(v_dev, b_dev)
    want = export_lib.make_serving_fn(cfg)(variables, batch)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_export_cli(monkeypatch, capsys, tmp_path):
    preset = presets_mod.Preset(
        name='tiny_kitti',
        model=_tiny_kitti_cfg(),
        data=presets_mod.DataConfig(
            dataset='kitti', classes=('car',),
            n_images_test=1, test_size=(64, 64)))
    monkeypatch.setattr(presets_mod, 'get_preset', lambda name: preset)
    out_path = str(tmp_path / 'cli.stablehlo')
    monkeypatch.setattr(sys, 'argv', [
        'export.py', 'tiny_kitti', '--out', out_path, '--verify'])
    export_cli.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep['verified'] is True
    assert rep['bytes'] == os.path.getsize(out_path)
    assert rep['outputs']['boxes'][-1] == 7
    assert rep['weights'] == 'inputs'

    # polymorphic-batch export verifies too and reports the symbolic dim
    monkeypatch.setattr(sys, 'argv', [
        'export.py', 'tiny_kitti', '--out', out_path, '--poly-batch',
        '--batch-size', '2', '--verify'])
    export_cli.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep['verified'] is True
    assert rep['outputs']['boxes'][0] == 'b'


def test_export_cli_view_sharded(monkeypatch, capsys, tmp_path):
    preset = presets_mod.Preset(
        name='tiny_scannet',
        model=_tiny_indoor_cfg(dataset='scannet', fast=True),
        data=presets_mod.DataConfig(
            dataset='scannet', classes=('a', 'b', 'c'),
            n_images_test=8, test_size=(64, 64)))
    monkeypatch.setattr(presets_mod, 'get_preset', lambda name: preset)
    out_path = str(tmp_path / 'sharded_cli.stablehlo')
    monkeypatch.setattr(sys, 'argv', [
        'export.py', 'tiny_scannet', '--out', out_path, '--view-sharded',
        '--verify'])
    export_cli.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep['verified'] is True
    assert rep['devices'] == 8


def test_export_cli_data_sharded(monkeypatch, capsys, tmp_path):
    preset = presets_mod.Preset(
        name='tiny_kitti',
        model=_tiny_kitti_cfg(),
        data=presets_mod.DataConfig(
            dataset='kitti', classes=('car',),
            n_images_test=1, test_size=(64, 64)))
    monkeypatch.setattr(presets_mod, 'get_preset', lambda name: preset)
    out_path = str(tmp_path / 'dp_cli.stablehlo')
    monkeypatch.setattr(sys, 'argv', [
        'export.py', 'tiny_kitti', '--out', out_path, '--data-sharded',
        '--batch-size', '8', '--verify'])
    export_cli.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep['verified'] is True
    assert rep['devices'] == 8
    assert rep['outputs']['boxes'][0] == 8
