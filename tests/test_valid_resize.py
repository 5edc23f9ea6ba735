"""Pin the trilinear mask-resize and neck upsample against live torch.

Targets (VERDICT round-1, weak #5):
  - ``resize_valid_to_levels`` vs the reference's
    ``nn.Upsample(mode='trilinear')(valid.float()).round().bool()``
    (``mmdet3d/models/dense_heads/imvoxel_head.py:112-114``) — the
    validity-mask *down*-scale to levels 1..2, where jax's antialias default
    diverges from torch (this caught a real 18%-of-voxels parity bug).
  - the 3D-neck decoder's x2 trilinear upsample
    (``mmdet3d/models/necks/imvoxelnet.py:361``, align_corners=False).

Both tests compare against torch computed live (no stored fixtures), incl.
masks engineered to interpolate to exactly 0.5 so the round-half-to-even
boundary is exercised.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from imvoxelnet_tpu.models.heads.imvoxel_heads import resize_valid_to_levels
from imvoxelnet_tpu.models.necks3d import _trilinear_up2

LEVELS = [(40, 40, 16), (20, 20, 8), (10, 10, 4)]


def _torch_levels(mask_bdhw):
    t = torch.from_numpy(mask_bdhw.astype(np.float32))[:, None]
    outs = []
    for size in LEVELS:
        r = torch.nn.functional.interpolate(
            t, size=size, mode='trilinear', align_corners=False)
        outs.append(r[:, 0].round().numpy() > 0)
    return outs


def test_valid_resize_matches_torch_random():
    rng = np.random.RandomState(0)
    for density in (0.2, 0.5, 0.8):
        mask = rng.rand(2, 40, 40, 16) < density
        got = resize_valid_to_levels(jnp.asarray(mask), LEVELS)
        want = _torch_levels(mask)
        for g, w, size in zip(got, want, LEVELS):
            np.testing.assert_array_equal(np.asarray(g), w, err_msg=str(size))


def test_valid_resize_exact_half_boundary():
    """Downscale-by-2 averages 8 voxels; 4-of-8 blocks hit exactly 0.5.

    torch and numpy both round-half-to-even, so 0.5 -> 0 -> False.  Build a
    mask that is 4-of-8 in every 2x2x2 block (checkerboard) and assert both
    frameworks agree (and that the boundary resolves to False).
    """
    idx = np.indices((40, 40, 16)).sum(axis=0)
    mask = (idx % 2 == 0)[None]              # exactly 4 of every 2x2x2 block
    got = resize_valid_to_levels(jnp.asarray(mask), LEVELS)
    want = _torch_levels(mask)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)
    # interior of level 1 is the pure 0.5 case -> rounds to 0 (half-to-even)
    assert not np.asarray(got[1])[0, 5:15, 5:15, 2:6].any()


def test_valid_resize_single_voxel_islands():
    """Isolated voxels stress the sampling-position convention: a one-voxel
    island survives a 2x downscale only if the half-pixel-centre sample puts
    >0.5 weight on it, which depends on the exact grid alignment."""
    rng = np.random.RandomState(1)
    mask = np.zeros((1, 40, 40, 16), bool)
    ii = rng.randint(0, 40, 60), rng.randint(0, 40, 60), rng.randint(0, 16, 60)
    mask[0][ii] = True
    got = resize_valid_to_levels(jnp.asarray(mask), LEVELS)
    want = _torch_levels(mask)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_trilinear_up2_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 6, 4, 3).astype(np.float32)        # NDHWC
    got = np.asarray(_trilinear_up2(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)          # NCDHW
    want = torch.nn.functional.interpolate(
        t, scale_factor=2, mode='trilinear',
        align_corners=False).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
