"""Lane-packed Pallas kernel for lane-bound shallow-z 3x3x3 convolutions.

Targets the KITTI/nuScenes neck ``block0`` (``necks/imvoxelnet.py:94-123``
in the reference): a 3x3x3 SAME conv with 64 input and 64 output channels
over a ``(B, nx, ny, nz, 64)`` voxel volume.  With only 64 output channels
the MXU's 128 output lanes are half-filled, and XLA's conv measures ~40%
MFU (docs/performance.md round-2 trace attribution); every XLA-level
reformulation either doubles the FLOPs (z-pair channel folding) or round-
trips a 3x-wide intermediate through HBM (per-z-tap output concat) — both
measured washes.

This kernel does the output-concat trick *without* the HBM round-trip:

  * Rows of the matmul are ``(i, j, z)`` output sites; the contraction is
    the 9 in-plane taps x 64 input channels (K = 576); the columns are the
    3 z-taps x 64 output channels (N = 192, 1.5x the 128 lanes instead of
    0.5x).  FLOPs are identical to the dense conv — every (tap, site)
    product is computed exactly once.
  * The per-z-tap partial sums ``Y[(i,j,z), dz, co]`` stay in VMEM; the
    shifted combine ``out[z] = Y[z-1, 0] + Y[z, 1] + Y[z+1, 2]`` happens
    in-register before the single output write.

The halo over (nx, ny) uses ``pl.Element`` block dims on a once-padded
input (all window offsets in bounds), double-buffered by the standard
Pallas pipeline.  Gradients take the XLA path: a ``custom_vjp`` transposes
the *reference* ``lax.conv_general_dilated`` (``jax.linear_transpose``), so
backward numerics are exactly today's.

Enabled inside :class:`models.necks3d.Conv3x3x3` for lane-bound shapes when
``IMVOXELNET_TPU_CONV3Z_PALLAS=1`` (off by default until the hardware
microbench in docs/performance.md justifies flipping it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, x_ref, out_ref, *, tx: int, ty: int, nz: int, cin: int,
            cout: int):
    slab = x_ref[...]  # (tx+2, ty+2, nz, cin)
    parts = []
    for dx in range(3):
        for dy in range(3):
            v = slab[dx:dx + tx, dy:dy + ty]
            parts.append(v.reshape(tx * ty * nz, cin))
    a = jnp.concatenate(parts, axis=1)                      # (R, 9*cin)
    y = jax.lax.dot_general(
        a, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (R, 3*cout)
    # The z-shifted combine stays 2-D: Mosaic's infer-vector-layout rejects
    # the natural (R, 3*cout) -> (tx, ty, nz, 3, cout) shape cast (splitting
    # the lane dim is "unsupported shape cast", measured on jax 0.9.0).
    # Rows are (i, j, z) with z minor, so "z - 1" is "row - 1": a sublane
    # roll plus an iota mask that zeroes the rows that wrapped across an
    # (i, j) block boundary.
    tap0 = y[:, :cout]              # reads input z-1 => contributes to z+1
    mid = y[:, cout:2 * cout]
    tap2 = y[:, 2 * cout:]          # reads input z+1 => contributes to z-1
    row_z = jax.lax.broadcasted_iota(
        jnp.int32, (tx * ty * nz, cout), 0) % nz
    out = mid
    out = out + jnp.where(row_z > 0, pltpu.roll(tap0, 1, axis=0), 0.0)
    out = out + jnp.where(row_z < nz - 1,
                          pltpu.roll(tap2, tx * ty * nz - 1, axis=0), 0.0)
    out_ref[...] = out.reshape(tx, ty, nz, cout).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('tx', 'ty', 'interpret'))
def _conv3z_pallas(x, kernel, *, tx: int, ty: int, interpret: bool):
    b, nx, ny, nz, cin = x.shape
    cout = kernel.shape[-1]
    n_tx = -(-nx // tx)
    n_ty = -(-ny // ty)
    # Pad so every (tx+2, ty+2) element window is in bounds; the zero halo
    # provides the SAME-conv x/y padding (z is handled by the combine).
    xp = jnp.pad(x, ((0, 0), (1, n_tx * tx + 1 - nx), (1, n_ty * ty + 1 - ny),
                     (0, 0), (0, 0)))
    # (3,3,3,ci,co) -> rows (dx, dy, ci), cols (dz, co)
    w2 = jnp.transpose(kernel, (0, 1, 3, 2, 4)).reshape(9 * cin, 3 * cout)
    w2 = w2.astype(x.dtype)

    grid = (b, n_tx, n_ty)
    kern = functools.partial(_kernel, tx=tx, ty=ty, nz=nz, cin=cin, cout=cout)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, resident
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(tx + 2), pl.Element(ty + 2),
                 pl.Element(nz), pl.Element(cin)),
                lambda bb, i, j: (bb, i * tx, j * ty, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), tx, ty, nz, cout),
            lambda bb, i, j: (bb, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tx * tx, n_ty * ty, nz, cout),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel'),
            # the im2col + 3-tap working set overflows the default 16 MiB
            # scoped-vmem budget at useful tile sizes (28.9 MiB at 8x16);
            # v5e has 128 MiB of VMEM — let the kernel use half of it
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(w2, xp)
    return out[:, :nx, :ny]


def _conv_ref(x, kernel):
    """The XLA conv this kernel replaces (and whose transpose is the VJP)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3z_lanepack(x, kernel, tx: int = 8, ty: int = 16,
                    interpret: bool | None = None):
    """3x3x3 SAME stride-1 conv, MXU-lane-packed over the 3 z-taps.

    Same contract as ``lax.conv_general_dilated(..., NDHWC/DHWIO, SAME)``
    on ``(B, nx, ny, nz, Cin) x (3, 3, 3, Cin, Cout)``.  Accumulation is
    fp32 (matching XLA's conv); the summation order differs, so results
    match to float tolerance, not bit-exactly.  ``interpret=None``
    auto-selects the Pallas interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _conv3z_pallas(x, kernel, tx=tx, ty=ty, interpret=interpret)


def _fwd(x, kernel, tx, ty, interpret):
    return conv3z_lanepack(x, kernel, tx, ty, interpret), (x, kernel)


def _bwd(tx, ty, interpret, res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    (dx,) = jax.linear_transpose(lambda x_: _conv_ref(x_, kernel), x)(g)
    (dk,) = jax.linear_transpose(lambda k_: _conv_ref(x, k_), kernel)(g)
    return dx, dk


conv3z_lanepack.defvjp(_fwd, _bwd)
