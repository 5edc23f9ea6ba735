"""Smoke tests for the benchmark CLI's forward paths (serving loop and
``--view-sharded``) on a tiny monkeypatched preset.

The hardware numbers live in docs/performance.md; these tests only pin that
the CLI plumbing — preset resolution, the one-batch-in-flight serving loop,
and the view-sharded shard_map composition — builds, runs, and reports.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import benchmark  # noqa: E402

from imvoxelnet_tpu.configs import presets as presets_mod  # noqa: E402
from test_models import _tiny_indoor_cfg  # noqa: E402


def _tiny_preset(n_images_test):
    return presets_mod.Preset(
        name='tiny_scannet',
        model=_tiny_indoor_cfg(dataset='scannet', fast=True),
        data=presets_mod.DataConfig(
            dataset='scannet', classes=('a', 'b', 'c'),
            n_images_test=n_images_test, test_size=(32, 32)))


def _run_cli(monkeypatch, capsys, argv, preset):
    monkeypatch.setattr(presets_mod, 'get_preset', lambda name: preset)
    monkeypatch.setattr(sys, 'argv', ['benchmark.py'] + argv)
    benchmark.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

def test_benchmark_cli_forward(monkeypatch, capsys):
    out = _run_cli(
        monkeypatch, capsys,
        ['tiny_scannet', '--batch-size', '1', '--iters', '2', '--warmup', '0',
         '--dtype', 'float32'],
        _tiny_preset(n_images_test=2))
    assert out['mode'] == 'fwd' and out['scenes_per_sec'] > 0


def test_benchmark_cli_train(monkeypatch, capsys):
    out = _run_cli(
        monkeypatch, capsys,
        ['tiny_scannet', '--train', '--batch-size', '1', '--iters', '2',
         '--warmup', '0', '--dtype', 'float32'],
        _tiny_preset(n_images_test=1))
    assert out['mode'] == 'train' and out['scenes_per_sec'] > 0


def test_benchmark_cli_exact_nms(monkeypatch, capsys):
    out = _run_cli(
        monkeypatch, capsys,
        ['tiny_scannet', '--exact-nms', '--batch-size', '1', '--iters', '1',
         '--warmup', '0', '--dtype', 'float32'],
        _tiny_preset(n_images_test=1))
    assert out['mode'] == 'fwd' and out['scenes_per_sec'] > 0


def test_benchmark_cli_view_sharded(monkeypatch, capsys):
    """8 views over the 8-device CPU mesh (1 view/device)."""
    import jax
    if len(jax.devices()) != 8:
        pytest.skip('needs the 8-device CPU mesh')
    out = _run_cli(
        monkeypatch, capsys,
        ['tiny_scannet', '--view-sharded', '--batch-size', '1', '--iters',
         '2', '--warmup', '0', '--dtype', 'float32'],
        _tiny_preset(n_images_test=8))
    assert out['mode'] == 'fwd' and out['scenes_per_sec'] > 0
