"""Benchmark: flagship (KITTI monocular) forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's ``tools/benchmark.py:63-91`` (warm-up,
synchronized timing around the full ``simple_test`` forward incl. NMS); each
timed iteration ends with a device-to-host fetch of the detection outputs so
the measurement covers real execution (the axon PJRT backend's
``block_until_ready`` alone does not).  ``vs_baseline`` divides by 25
scenes/sec — a generous estimate of the reference PyTorch pipeline's
single-V100 forward FPS for this config (no official number is published;
BASELINE.md notes the 5x target).
"""

import json
import os
import time

import numpy as np

REFERENCE_GPU_SCENES_PER_SEC = 25.0

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '.jax_cache'))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from __graft_entry__ import _kitti_batch
    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict

    import dataclasses
    preset = get_preset('imvoxelnet_kitti')
    model_cfg = dataclasses.replace(preset.model, compute_dtype='bfloat16')
    model = ImVoxelNet(model_cfg)
    batch_size = int(os.environ.get('BENCH_BATCH', '8'))
    batch = _kitti_batch(b=batch_size, v=1, h=384, w=1280)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    @jax.jit
    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False)
        return imvoxelnet_predict(model_cfg, *outs, batch)

    def fetch(out):
        # force completion + transfer of the actual detections
        return float(np.asarray(out['scores']).sum())

    fetch(forward(variables, batch))  # compile
    fetch(forward(variables, batch))  # steady-state warm-up

    # Steady-state serving throughput: keep one batch in flight so host
    # dispatch/tunnel latency overlaps device execution; every iteration
    # still ends with a d2h fetch of the previous batch's detections, so the
    # measurement covers real execution on the axon backend.
    n_iters = 20
    t0 = time.perf_counter()
    prev = forward(variables, batch)
    for _ in range(n_iters - 1):
        cur = forward(variables, batch)
        fetch(prev)
        prev = cur
    fetch(prev)
    dt = time.perf_counter() - t0

    scenes_per_sec = batch_size * n_iters / dt
    # Model cost: 2.69 TFLOP/scene, derived per-layer AND cross-checked
    # against XLA's HLO cost analysis by tools/flops.py (neck 2.60 +
    # ResNet-50 0.080 + FPN/head 0.005 at 384x1280, 2 x MAC convention).
    # v5e nominal bf16 peak = 197 TFLOP/s.
    tflop_per_scene = 2.69
    mfu = scenes_per_sec * tflop_per_scene / 197.0
    print(json.dumps({
        'metric': 'kitti_fwd_scenes_per_sec_per_chip',
        'value': round(scenes_per_sec, 2),
        'unit': 'scenes/sec',
        'vs_baseline': round(scenes_per_sec / REFERENCE_GPU_SCENES_PER_SEC, 3),
        'mfu': round(mfu, 3),
    }))


if __name__ == '__main__':
    main()
