"""Execute the multi-host path once: 2-process CPU ``jax.distributed``.

The reference trains multi-GPU via ``torch.distributed.launch`` +
``init_dist`` (``tools/dist_train.sh:8-9``, ``tools/train.py:97-102``); our
analog is ``tools/train.py --multihost`` -> ``jax.distributed.initialize()``.
This tool is the cross-host analog of ``__graft_entry__.dryrun_multichip``
part 3: it spawns TWO OS processes, each owning 2 virtual CPU devices, forms
the 4-device global mesh across them (collectives over gloo), runs ONE real
train step on a globally-sharded batch, and asserts the result numerically
equals the same global batch on a single device — proving the
``jax.distributed`` init path, cross-process GSPMD sharding, and the gradient
all-reduce semantics end-to-end without TPU pod hardware.

Usage:
  python tools/validate_multihost.py            # orchestrates + asserts
  python tools/validate_multihost.py --worker I --port P --out F   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_LOCAL_DEVICES = 2  # per process
_PROCESSES = 2
_GLOBAL_BATCH = 4


def _configure_cpu(n_local: int):
    """CPU platform + n virtual devices; must run before backend init.

    Same caveat as ``__graft_entry__.dryrun_multichip``: the container's
    sitecustomize imports jax at interpreter start, so JAX_PLATFORMS in the
    environment is too late — only ``jax.config.update`` takes effect, while
    XLA_FLAGS is still read lazily at CPU-client creation.
    """
    flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    flags.append(f'--xla_force_host_platform_device_count={n_local}')
    os.environ['XLA_FLAGS'] = ' '.join(flags)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return jax


def _tiny_setup(jax):
    """The dryrun_multichip tiny-but-real KITTI train graph + global batch."""
    from __graft_entry__ import _kitti_batch
    from imvoxelnet_tpu.models.detector import (
        ImVoxelNet, ImVoxelNetConfig, NeckConfig)
    from imvoxelnet_tpu.models.heads.anchor3d_head import Anchor3DHeadConfig
    from imvoxelnet_tpu.parallel import train as train_lib

    cfg = ImVoxelNetConfig(
        n_voxels=(16, 20, 12), voxel_size=(0.3, 0.3, 0.3),
        fpn_out_channels=16,
        neck=NeckConfig(kind='kitti', in_channels=16, out_channels=32),
        head_kind='anchor3d',
        backbone_stage_blocks=(1, 1, 1, 1),
        anchor_head=Anchor3DHeadConfig(
            num_classes=1, anchor_ranges=((-3, -3, -1.0, 3, 3, -1.0),),
            nms_pre=64, max_out=8))
    model = ImVoxelNet(cfg)
    batch = _kitti_batch(b=_GLOBAL_BATCH, v=1, h=64, w=64, train=True)
    tx = train_lib.make_optimizer(1e-4, 1e-4, 0.1, 35.0, steps_per_epoch=10)
    state = train_lib.create_train_state(
        model, tx, jax.random.PRNGKey(0),
        _kitti_batch(b=1, v=1, h=64, w=64, train=True))
    step = train_lib.make_train_step(model, tx)
    return state, batch, step


def _worker(pid: int, port: int, out: str):
    jax = _configure_cpu(_LOCAL_DEVICES)
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=_PROCESSES, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    assert len(devices) == _PROCESSES * _LOCAL_DEVICES, devices
    mine = [i for i, d in enumerate(devices) if d.process_index == pid]
    # make_array_from_process_local_data maps local rows onto this process's
    # addressable devices; the equivalence below needs them to be the
    # contiguous global rows [2*pid, 2*pid+2)
    assert mine == [pid * _LOCAL_DEVICES, pid * _LOCAL_DEVICES + 1], mine

    mesh = Mesh(np.asarray(devices), ('data',))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P('data'))

    # Establish the gloo context NOW, while both processes are still in
    # lock-step: a coordination-service barrier followed by one trivial
    # cross-process collective.  Gloo's key exchange has a 30 s deadline;
    # on a 1-core host the heavy model-init compiles below serialize for
    # minutes, so deferring the first collective until then times it out
    # (measured: GetKeyValue() DEADLINE_EXCEEDED under the pytest run).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('gloo-warmup')
    tiny = jax.make_array_from_process_local_data(
        dp, np.ones((_GLOBAL_BATCH // _PROCESSES, 1), np.float32))
    total = jax.jit(lambda t: t.sum(), out_shardings=rep)(tiny)
    assert float(np.asarray(total)) == _GLOBAL_BATCH, np.asarray(total)

    state, batch, step_fn = _tiny_setup(jax)

    lo = pid * (_GLOBAL_BATCH // _PROCESSES)
    hi = lo + _GLOBAL_BATCH // _PROCESSES
    batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            dp, np.asarray(x)[lo:hi]), batch)
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    step = jax.jit(step_fn, in_shardings=(rep, dp), out_shardings=(rep, rep))
    new_state, metrics = step(state, batch)
    jax.block_until_ready(metrics['loss'])
    loss = float(metrics['loss'])
    print(f'[worker {pid}] loss={loss:.6f}', flush=True)
    if pid == 0:
        leaves, _ = jax.tree_util.tree_flatten(new_state.params)
        np.savez(out, loss=loss,
                 **{f'p{i}': np.asarray(x) for i, x in enumerate(leaves)})
    jax.distributed.shutdown()


def _orchestrate() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    out = os.path.join(tempfile.mkdtemp(prefix='multihost_'), 'w0.npz')
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--worker', str(i),
         '--port', str(port), '--out', out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(_PROCESSES)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode:
            sys.stderr.write(f'--- worker {i} rc={p.returncode} ---\n{log}\n')
            print(json.dumps({'ok': False, 'failed_worker': i,
                              'rc': p.returncode}))
            return 1

    # single-process reference on the SAME global batch (dryrun part-3 style)
    jax = _configure_cpu(1)
    import numpy as np
    state, batch, step_fn = _tiny_setup(jax)
    new_state, metrics = jax.jit(step_fn)(state, batch)
    jax.block_until_ready(metrics['loss'])
    loss_1 = float(metrics['loss'])

    got = np.load(out)
    loss_2 = float(got['loss'])
    assert abs(loss_2 - loss_1) <= 1e-5 + 1e-5 * abs(loss_1), (loss_2, loss_1)
    leaves, _ = jax.tree_util.tree_flatten(new_state.params)
    mean_diff = max_diff = 0.0
    for i, ref in enumerate(leaves):
        d = np.abs(np.asarray(ref, np.float64) -
                   got[f'p{i}'].astype(np.float64))
        mean_diff = max(mean_diff, float(d.mean()))
        max_diff = max(max_diff, float(d.max()))
    # same thresholds as dryrun_multichip part 3: layer-mean ~100x below lr
    # catches missing gradient averaging; max bounds Adam-amplified noise
    assert mean_diff < 1e-5, f'params diverge: worst layer mean {mean_diff}'
    assert max_diff < 3e-4, f'params diverge: max abs diff {max_diff}'
    print(json.dumps({'ok': True, 'loss_2proc': loss_2, 'loss_1proc': loss_1,
                      'dloss': abs(loss_2 - loss_1), 'dparams_max': max_diff,
                      'dparams_layer_mean': mean_diff}))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--port', type=int, default=None)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    if args.worker is None:
        raise SystemExit(_orchestrate())
    _worker(args.worker, args.port, args.out)


if __name__ == '__main__':
    main()
