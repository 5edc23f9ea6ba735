"""Smoke tests for the small CLI tools (print_config, analyze_logs,
publish_model) — reference ``tools/`` parity surfaces with no model in the
loop."""

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import analyze_logs  # noqa: E402
import demo  # noqa: E402
import print_config  # noqa: E402
import publish_model  # noqa: E402

from test_datasets import sunrgbd_root  # noqa: F401, E402  (fixture)


def test_print_config_lists_presets(monkeypatch, capsys):
    monkeypatch.setattr(sys, 'argv', ['print_config.py'])
    print_config.main()
    out = capsys.readouterr().out
    names = out.strip().splitlines()
    # the 14 reference configs (plus internal helpers like tiny_kitti_test)
    for family in ('kitti', 'nuscenes', 'scannet', 'sunrgbd',
                   'perspective_sunrgbd', 'total_sunrgbd'):
        assert f'imvoxelnet_{family}' in names, family
    assert sum(1 for n in names if n.startswith('imvoxelnet_')) == 14


def test_print_config_resolves_preset(monkeypatch, capsys):
    monkeypatch.setattr(sys, 'argv', ['print_config.py', 'imvoxelnet_kitti'])
    print_config.main()
    out = capsys.readouterr().out
    assert "'n_voxels': (216, 248, 12)" in out


def test_print_config_override(monkeypatch, capsys):
    """--override (the reference --options analog) reaches the CLI layer."""
    monkeypatch.setattr(sys, 'argv', [
        'print_config.py', 'imvoxelnet_kitti',
        '--override', 'model.anchor_head.score_thr=0.25',
        '--override', 'lr=0.0002'])
    print_config.main()
    out = capsys.readouterr().out
    assert "'score_thr': 0.25" in out
    assert "'lr': 0.0002" in out


def test_analyze_logs_summary(tmp_path, monkeypatch, capsys):
    log = tmp_path / 'train_log.jsonl'
    with open(log, 'w') as f:
        for i in range(5):
            f.write(json.dumps(dict(step=i, loss=2.0 - 0.3 * i)) + '\n')
    monkeypatch.setattr(sys, 'argv', ['analyze_logs.py', str(log)])
    analyze_logs.main()
    out = capsys.readouterr().out
    assert 'loss: first=2.0000 last=0.8000' in out
    assert 'n=5' in out


def test_demo_cli_end_to_end(sunrgbd_root, tmp_path, monkeypatch,  # noqa: F811
                             capsys):
    """demo.py on the synthetic SUN RGB-D fixture with a tiny preset:
    random-weight inference + wireframe rendering + .obj export."""
    from imvoxelnet_tpu.configs import presets as presets_mod
    from test_models import _tiny_indoor_cfg

    tiny = presets_mod.Preset(
        name='tiny_sunrgbd', model=_tiny_indoor_cfg('sunrgbd'),
        data=presets_mod.DataConfig(
            dataset='sunrgbd', classes=('bed', 'table'),
            test_size=(160, 128), max_gt=8))
    monkeypatch.setattr(presets_mod, 'get_preset', lambda name: tiny)
    out_dir = str(tmp_path / 'demo')
    monkeypatch.setattr(sys, 'argv', [
        'demo.py', 'tiny_sunrgbd', '--data-root', sunrgbd_root,
        '--ann-file', os.path.join(sunrgbd_root, 'infos.pkl'),
        '--out-dir', out_dir, '--obj'])
    demo.main()
    out = capsys.readouterr().out
    assert 'detections' in out and 'wrote:' in out
    assert any(f.endswith('.obj') for f in os.listdir(out_dir))


def test_publish_model_strips_optimizer_state(tmp_path, monkeypatch, capsys):
    ckpt = dict(params={'w': np.ones(3)}, batch_stats={'m': np.zeros(2)},
                opt_state={'momentum': np.ones(3)}, step=7,
                meta=dict(preset='imvoxelnet_kitti'))
    src = tmp_path / 'epoch_12.ckpt'
    with open(src, 'wb') as f:
        pickle.dump(ckpt, f)
    monkeypatch.setattr(sys, 'argv', [
        'publish_model.py', str(src), str(tmp_path / 'published.ckpt')])
    publish_model.main()
    out = capsys.readouterr().out.strip()
    published = out.split()[-1]
    assert os.path.exists(published)
    # 8-hex content hash in the published filename (reference convention)
    stem = os.path.basename(published)
    assert stem.startswith('published-') and stem.endswith('.ckpt')
    with open(published, 'rb') as f:
        slim = pickle.load(f)
    assert set(slim) == {'params', 'batch_stats', 'meta'}


def test_analyze_trace_hlo_body_sources(tmp_path):
    """load_hlo_sources resolves fusion -> dominant repo source through
    NESTED fused computations (TPU custom/loop fusions put metadata one
    level down) and through line-final ``calls=`` with no trailing comma —
    both were round-5 parser bugs that silently dropped the mapping."""
    import analyze_trace

    hlo = '''
%region_1.2 (p0: bf16[], p1: bf16[]) -> bf16[] {
  %p0 = bf16[] parameter(0)
  ROOT %add.1 = bf16[] add(%p0, %p0), metadata={op_name="scatter-add" source_file="/root/repo/imvoxelnet_tpu/models/dcn.py" source_line=43}
}

%fused_computation.9.clone (p0: bf16[8,4]) -> bf16[8,4] {
  %p0 = bf16[8,4] parameter(0)
  %t.1 = bf16[8,4] transpose(%p0), dimensions={0,1}, metadata={op_name="x" source_file="/root/repo/imvoxelnet_tpu/models/dcn.py" source_line=43}
  ROOT %scatter.1 = bf16[8,4] scatter(%p0, %t.1), to_apply=%region_1.2, metadata={source_file="/opt/venv/lib/site-packages/flax/linen/linear.py" source_line=700}
}

%fused_computation.9 (p0: bf16[8,4]) -> bf16[8,4] {
  %p0 = bf16[8,4] parameter(0)
  ROOT %fusion.2 = bf16[8,4] fusion(%p0), kind=kCustom, calls=%fused_computation.9.clone
}

ENTRY %main (p0: bf16[8,4]) -> bf16[8,4] {
  %p0 = bf16[8,4] parameter(0)
  ROOT %fusion.1 = bf16[8,4] fusion(%p0), kind=kCustom, calls=%fused_computation.9, backend_config={}
}
'''
    path = tmp_path / 'mod.after_optimizations.txt'
    path.write_text(hlo)
    src = analyze_trace.load_hlo_sources(str(path))
    # fusion.1 -> fused_computation.9 -> (nested) .9.clone; the repo source
    # outranks the site-packages one regardless of count
    assert src['fusion.1'] == '/root/repo/imvoxelnet_tpu/models/dcn.py:43'
    assert src['fusion.2'] == '/root/repo/imvoxelnet_tpu/models/dcn.py:43'
