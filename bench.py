"""Benchmark: flagship (KITTI monocular) forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's ``tools/benchmark.py:63-91`` (warm-up,
synchronized timing around the full ``simple_test`` forward incl. NMS).
``vs_baseline`` is measured scenes/sec divided by 25 scenes/sec — a generous
estimate of the reference PyTorch pipeline's single-V100 forward FPS for this
config (no official number is published; BASELINE.md notes the 5x target).
"""

import json
import time

import numpy as np

REFERENCE_GPU_SCENES_PER_SEC = 25.0


def main():
    import jax

    from __graft_entry__ import _kitti_batch
    from imvoxelnet_tpu.configs.presets import get_preset
    from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict

    preset = get_preset('imvoxelnet_kitti')
    model = ImVoxelNet(preset.model)
    batch_size = 4
    batch = _kitti_batch(b=batch_size, v=1, h=384, w=1280)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    @jax.jit
    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False)
        return imvoxelnet_predict(preset.model, *outs, batch)

    # warm-up / compile
    out = forward(variables, batch)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    scenes_per_sec = batch_size * n_iters / dt
    print(json.dumps({
        'metric': 'kitti_fwd_scenes_per_sec_per_chip',
        'value': round(scenes_per_sec, 2),
        'unit': 'scenes/sec',
        'vs_baseline': round(scenes_per_sec / REFERENCE_GPU_SCENES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
