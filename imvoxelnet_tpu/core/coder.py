"""Delta XYZWLHR box coder (pure jnp).

Parity: ``DeltaXYZWLHRBBoxCoder``
(``mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py:20-90``): offsets
normalised by the BEV diagonal, log sizes, additive yaw, z referenced to the
anchor's gravity center.
"""

from __future__ import annotations

import jax.numpy as jnp


def encode(anchors, boxes):
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    xg, yg, zg, wg, lg, hg, rg = (boxes[..., i] for i in range(7))
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    out = jnp.stack([
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / ha,
        jnp.log(wg / wa),
        jnp.log(lg / la),
        jnp.log(hg / ha),
        rg - ra,
    ], axis=-1)
    if anchors.shape[-1] > 7:
        out = jnp.concatenate(
            [out, boxes[..., 7:] - anchors[..., 7:]], axis=-1)
    return out


def decode(anchors, deltas):
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    xt, yt, zt, wt, lt, ht, rt = (deltas[..., i] for i in range(7))
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    wg = jnp.exp(wt) * wa
    lg = jnp.exp(lt) * la
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    out = jnp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)
    if anchors.shape[-1] > 7:
        out = jnp.concatenate(
            [out, deltas[..., 7:] + anchors[..., 7:]], axis=-1)
    return out
