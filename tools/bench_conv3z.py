"""Microbenchmark: the lane-bound block0 conv vs the lane-packed kernel.

The KITTI b8 forward trace shows neck block0's two 64->64 3x3x3 convs at
28.6 ms combined, 35-42% MFU — the MXU's 128 output lanes are half-filled
(docs/performance.md round-2 trace attribution).  This times, standalone on
the TPU at the exact block0 operand shape (d2h-fetch timing, see
axon-tpu-quirks):

  xla          lax.conv_general_dilated (what the model runs today)
  pallas TxT   ops/conv3z_pallas.conv3z_lanepack at several (tx, ty) tiles

The kernel packs the 3 z-taps onto the output lanes (N=192) at identical
FLOPs and combines the shifted partials in VMEM; its model-level gate is
IMVOXELNET_TPU_CONV3Z_PALLAS=1 (models/necks3d.py:Conv3x3x3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    from imvoxelnet_tpu.ops.conv3z_pallas import _conv_ref, conv3z_lanepack

    b, nx, ny, nz, c = 8, 216, 248, 12, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, nx, ny, nz, c), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.05, jnp.bfloat16)
    macs = b * nx * ny * nz * 27 * c * c
    print(f'shape ({b},{nx},{ny},{nz},{c})  {2 * macs / 1e12:.3f} TFLOP',
          flush=True)

    def timeit(name, fn, iters=20):
        try:
            out = fn()
        except Exception as e:
            print(f'{name:12s} FAILED: {type(e).__name__}: {e}')
            return None
        chk = float(np.asarray(out[0, 5, 5, 5, :3]).sum())  # compile + fetch
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(np.asarray(out[0, 0, 0, 0, 0]))               # d2h fence
        dt = (time.perf_counter() - t0) / iters * 1000
        mfu = 2 * macs / (dt / 1000) / 197e12
        print(f'{name:12s} {dt:8.2f} ms   MFU {mfu:.3f}   (check {chk:.2f})',
              flush=True)
        return dt

    # operands must be jit *arguments*: closing over them bakes 658 MB of
    # constants into the program and the axon remote-compile RPC rejects the
    # payload (HTTP 413)
    ref_call = jax.jit(_conv_ref)
    timeit('xla', lambda: ref_call(x, w))
    pallas_call_ = jax.jit(conv3z_lanepack, static_argnums=(2, 3, 4))
    for tx, ty in [(8, 16), (8, 32), (16, 16), (16, 32), (8, 64)]:
        dt = timeit(f'pallas {tx}x{ty}', lambda: pallas_call_(x, w, tx, ty,
                                                              False))

    # numerical check of the winner vs XLA at this shape
    got = np.asarray(conv3z_lanepack(x, w, 8, 16, False)).astype(np.float32)
    want = np.asarray(_conv_ref(x, w)).astype(np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f'max rel err vs xla: {err:.2e}')


if __name__ == '__main__':
    main()
