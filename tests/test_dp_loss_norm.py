"""DP loss-normalization semantics (docs/parity.md "DP training semantics").

The reference's indoor head normalizes each image's cls/centerness losses by
``max(reduce_mean(n_pos), 1)`` — the image's positive count averaged across
DDP ranks (``imvoxel_head.py:196``).  Our two modes:
  per_image   — exact at world size 1 (reduce_mean is the identity);
  batch_mean  — the GSPMD multi-chip analog: normalize by the global-batch
                mean count.  At samples_per_gpu=1 this is EXACTLY the
                reference's cross-rank mean; proven below by comparing a
                real 2-device shard_map run (per_image + pmean) against
                batch_mean on the combined batch.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_loss
from imvoxelnet_tpu.models.heads import imvoxel_heads as ivh

from test_models import _make_batch, _tiny_indoor_cfg


def _head_outs_and_batch(b=2):
    """Run the tiny indoor model once to get real head outputs."""
    cfg = _tiny_indoor_cfg(dataset='sunrgbd', version=1)
    # different per-image gt counts -> different per-image n_pos: image 1
    # gets NO ground truth at all (n_pos=0 vs image 0's positives)
    batch = _make_batch(b=b, h=64, w=64, g=4, seed=3)
    mask = np.array(batch['gt_mask'])
    mask[0] = True
    if b > 1:
        mask[1:] = False
    batch['gt_mask'] = jnp.asarray(mask)
    model = ImVoxelNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    outs, _ = model.apply(variables, batch, train=True,
                          mutable=['batch_stats'])
    # Force every voxel "seen": the random single-view fixture sees only ~2%
    # of the grid, leaving image 0 with n_pos=1 — and max(n_pos, 1) then
    # clamps BOTH modes to the same normalizer (1 vs max(0.5, 1)), hiding
    # the per_image/batch_mean difference these tests must observe.
    head_outs, valid, f2d = outs
    outs = (head_outs, jnp.ones_like(valid), f2d)
    return cfg, batch, outs


def _loss(cfg, batch, outs, **kw):
    head_outs, valid, _ = outs
    return ivh.indoor_head_loss(
        head_outs, valid, batch['origins'], batch['gt_boxes'],
        batch['gt_labels'], batch['gt_mask'], cfg.indoor_head, **kw)


def test_batch_mean_equals_per_image_on_uniform_batch():
    cfg, batch, outs = _head_outs_and_batch(b=2)
    # duplicate image 0 so every image has the same n_pos
    dup = jax.tree_util.tree_map(
        lambda x: jnp.stack([x[0], x[0]]) if x.ndim >= 1 else x, batch)
    head_outs, valid, _ = outs
    dup_outs = (jax.tree_util.tree_map(
        lambda x: jnp.stack([x[0], x[0]]), head_outs),
        jnp.stack([valid[0], valid[0]]), None)
    a = _loss(cfg, dup, dup_outs, batch_mean=False)
    b = _loss(cfg, dup, dup_outs, batch_mean=True)
    for k in a:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-6)


def test_batch_mean_differs_when_counts_differ():
    cfg, batch, outs = _head_outs_and_batch(b=2)
    a = _loss(cfg, batch, outs, batch_mean=False)
    b = _loss(cfg, batch, outs, batch_mean=True)
    # cls/centerness normalize by n_pos -> modes differ; bbox normalizes by
    # the per-image centerness-weight sum in BOTH the reference
    # (imvoxel_head.py:216-220) and here -> identical across modes
    assert abs(float(a['loss_cls']) - float(b['loss_cls'])) > 1e-8
    np.testing.assert_allclose(float(a['loss_bbox']), float(b['loss_bbox']),
                               rtol=1e-6)


def test_batch_mean_equals_shardmap_pmean_at_one_sample_per_rank():
    """batch_mean on the global batch == the reference's cross-rank
    reduce_mean at samples_per_gpu=1, run as a REAL 2-device shard_map."""
    cfg, batch, outs = _head_outs_and_batch(b=2)
    head_outs, valid, _ = outs

    mesh = Mesh(np.asarray(jax.devices()[:2]), ('dp',))

    def ranked(head_outs, valid, origins, boxes, labels, mask):
        losses = ivh.indoor_head_loss(
            head_outs, valid, origins, boxes, labels, mask,
            cfg.indoor_head, axis_name='dp', batch_mean=False)
        # DDP averages the per-rank losses (gradient all-reduce mean)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, 'dp'), losses)

    sharded = jax.jit(jax.shard_map(
        ranked, mesh=mesh,
        in_specs=(P('dp'), P('dp'), P('dp'), P('dp'), P('dp'), P('dp')),
        out_specs=P()))
    got = sharded(head_outs, valid, batch['origins'], batch['gt_boxes'],
                  batch['gt_labels'], batch['gt_mask'])
    want = _loss(cfg, batch, outs, batch_mean=True)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=1e-5,
                                   err_msg=k)


def test_detector_cfg_plumbs_dp_loss_norm():
    import dataclasses
    cfg, batch, outs = _head_outs_and_batch(b=2)
    head_outs, valid, f2d = outs
    per = imvoxelnet_loss(cfg, head_outs, valid, f2d, batch)
    bm_cfg = dataclasses.replace(cfg, dp_loss_norm='batch_mean')
    bm = imvoxelnet_loss(bm_cfg, head_outs, valid, f2d, batch)
    assert abs(float(per['loss_cls']) - float(bm['loss_cls'])) > 1e-8
