"""Full CLI integration: tools/train.py (one epoch over the 8-device CPU
mesh, per-epoch validation, checkpoint write) then tools/test.py on the
checkpoint it produced — the in-suite analog of the reference's
``dist_train.sh`` -> ``dist_test.sh`` loop, on the ``tiny_kitti_test``
preset and a synthetic 4-sample KITTI fixture."""

import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), '..', 'tools')


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f'tool_{name}', os.path.join(_TOOLS, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def kitti4_root(tmp_path):
    """KITTI root with the reference fixture info duplicated to 4 samples
    (x repeat_times 2 = 8 = one batch over the 8-device mesh)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_datasets import _write_png
    root = str(tmp_path / 'kitti')
    _write_png(os.path.join(root, 'training/image_2/000000.png'), 375, 1242)
    with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl',
              'rb') as f:
        infos = pickle.load(f)
    with open(os.path.join(root, 'kitti_infos_train.pkl'), 'wb') as f:
        pickle.dump(infos * 4, f)
    return root


def test_train_then_test_cli(kitti4_root, tmp_path, monkeypatch, capsys):
    work_dir = str(tmp_path / 'work')
    ann = os.path.join(kitti4_root, 'kitti_infos_train.pkl')

    train_cli = _load_tool('train')
    monkeypatch.setattr(sys, 'argv', [
        'train.py', 'tiny_kitti_test', '--data-root', kitti4_root,
        '--ann-file', ann, '--work-dir', work_dir, '--epochs', '1',
        '--batch-size', '8', '--num-workers', '2', '--log-interval', '1',
        '--val-ann-file', ann])
    train_cli.main()
    capsys.readouterr()

    ckpt = os.path.join(work_dir, 'latest.ckpt')
    assert os.path.exists(ckpt)
    log_lines = [json.loads(line) for line in
                 open(os.path.join(work_dir, 'train_log.jsonl'))]
    train_lines = [r for r in log_lines if 'loss' in r]
    val_lines = [r for r in log_lines if r.get('mode') == 'val']
    assert train_lines and np.isfinite(train_lines[0]['loss'])
    assert val_lines and 'KITTI/Pedestrian_3D_moderate' in val_lines[0]

    test_cli = _load_tool('test')
    show_dir = str(tmp_path / 'shown')
    monkeypatch.setattr(sys, 'argv', [
        'test.py', 'tiny_kitti_test', '--data-root', kitti4_root,
        '--ann-file', ann, '--checkpoint', ckpt, '--batch-size', '8',
        '--num-workers', '2', '--show-dir', show_dir, '--show-num', '1',
        '--show-score-thr', '-1'])
    test_cli.main()
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index('{'):])
    assert 'KITTI/Pedestrian_3D_moderate' in metrics
    for v in metrics.values():
        assert np.isfinite(v)
    # --show-dir (the reference test.py --show analog) rendered wireframes
    shown = os.listdir(show_dir)
    assert shown and all(p.endswith('.png') for p in shown)

    # the trained checkpoint deploys: export CLI loads it, serializes the
    # serving artifact and verifies the roundtrip against direct apply
    export_cli = _load_tool('export')
    artifact = str(tmp_path / 'trained.stablehlo')
    monkeypatch.setattr(sys, 'argv', [
        'export.py', 'tiny_kitti_test', '--out', artifact,
        '--checkpoint', ckpt, '--verify'])
    export_cli.main()
    out = capsys.readouterr().out
    rep = json.loads(out[out.index('{'):])
    assert rep['verified'] is True and rep['bytes'] > 0

    # auto-resume: a second run with --epochs 2 must pick up latest.ckpt at
    # epoch 1 and train only the remaining epoch
    monkeypatch.setattr(sys, 'argv', [
        'train.py', 'tiny_kitti_test', '--data-root', kitti4_root,
        '--ann-file', ann, '--work-dir', work_dir, '--epochs', '2',
        '--batch-size', '8', '--num-workers', '2', '--log-interval', '1'])
    train_cli.main()
    out = capsys.readouterr().out
    assert 'resumed from' in out and 'at epoch 1' in out
    assert 'epoch 2/2 done' in out
    with open(ckpt, 'rb') as f:
        payload = pickle.load(f)
    assert payload['meta']['epoch'] == 2 and payload['step'] == 2


def test_train_cli_orbax_resume(kitti4_root, tmp_path, monkeypatch, capsys):
    """The --ckpt-format orbax path: sharded save each epoch, auto-resume
    restoring with the state's structure (the CPU-mesh re-put fix in
    utils/checkpoint.py is on this path)."""
    work_dir = str(tmp_path / 'work_orbax')
    ann = os.path.join(kitti4_root, 'kitti_infos_train.pkl')
    train_cli = _load_tool('train')

    base = ['train.py', 'tiny_kitti_test', '--data-root', kitti4_root,
            '--ann-file', ann, '--work-dir', work_dir, '--batch-size', '8',
            '--num-workers', '2', '--log-interval', '1',
            '--ckpt-format', 'orbax']
    monkeypatch.setattr(sys, 'argv', base + ['--epochs', '1'])
    train_cli.main()
    capsys.readouterr()
    assert os.path.isdir(os.path.join(work_dir, 'latest.orbax'))

    monkeypatch.setattr(sys, 'argv', base + ['--epochs', '2'])
    train_cli.main()
    out = capsys.readouterr().out
    assert 'resumed from' in out and 'at epoch 1' in out
    assert 'epoch 2/2 done' in out
