"""Shared validation runner: sharded inference over a val split + protocol
evaluation, reusable from ``tools/test.py`` and per-epoch validation inside
``tools/train.py``.

Parity: the reference's EvalHook path — ``mmdet.apis.train_detector(...,
validate=True)`` registers a per-epoch hook that runs ``single/multi_gpu_test``
and ``dataset.evaluate`` (reference ``tools/train.py:155``,
``configs/imvoxelnet/imvoxelnet_kitti.py:153`` ``evaluation=dict(interval=1)``);
and ``tools/test.py``'s result collection.  Metric names follow the reference
exactly (``KITTI/{cls}_3D_{difficulty}``, ``{cls}_AP_{thr}``, ``mAP_{thr}``)
so training curves are comparable line-for-line with the released logs.
"""

from __future__ import annotations

import numpy as np


def make_forward(preset, model, mesh=None):
    """Jitted ``simple_test`` forward; sharded over the mesh batch axis when
    one is given (the ``multi_gpu_test`` analog — GSPMD inserts the gathers)."""
    import jax

    from ..models.detector import imvoxelnet_predict

    use_pred_ext = preset.model.layout_head is not None

    def forward(variables, batch):
        outs = model.apply(variables, batch, train=False,
                           use_predicted_extrinsics=use_pred_ext)
        return imvoxelnet_predict(preset.model, *outs, batch)

    if mesh is not None:
        from ..parallel import mesh as mesh_lib
        rep = mesh_lib.replicated(mesh)
        dp = mesh_lib.batch_sharding(mesh)
        return jax.jit(forward, in_shardings=(rep, dp), out_shardings=rep)
    return jax.jit(forward)


def run_inference(forward, variables, loader, n_samples, mesh=None):
    """Run the forward over a loader epoch, unpadding ragged final batches.

    Returns a list of per-sample dicts with numpy ``boxes/scores/labels``
    (+ ``angles``/``layout`` for Total3D presets).
    """
    import jax

    from ..parallel import mesh as mesh_lib

    shard = mesh is not None
    if shard:
        n_dev = len(mesh.devices.flat)

    def padded():
        for batch in loader.epoch(0):
            if shard and batch['images'].shape[0] % n_dev != 0:
                shortfall = -batch['images'].shape[0] % n_dev
                batch = {k: np.concatenate([v] + [v[-1:]] * shortfall)
                         for k, v in batch.items()}
            yield batch

    if shard:
        place = lambda b: mesh_lib.shard_batch(b, mesh)  # noqa: E731
    else:
        place = lambda b: jax.device_put(b)              # noqa: E731
    results = []
    # upload batch N+1 while batch N's forward runs (serial RPC otherwise
    # through the axon tunnel — see parallel/mesh.py:device_prefetch)
    for batch in mesh_lib.device_prefetch(padded(), place):
        out = jax.device_get(forward(variables, batch))
        for i in range(batch['images'].shape[0]):
            valid = out['valid'][i]
            res = dict(boxes=out['boxes'][i][valid],
                       scores=out['scores'][i][valid],
                       labels=out['labels'][i][valid])
            if 'angles' in out:
                res['angles'] = out['angles'][i]
                res['layout'] = out['layout'][i]
            results.append(res)
    return results[:n_samples]


def evaluate_results(preset, preset_name, dataset, results):
    """Dispatch to the dataset's evaluation protocol; returns a flat metric
    dict with reference metric names."""
    d = preset.data
    if d.dataset == 'kitti':
        from .kitti_eval import convert_to_kitti_annos, kitti_eval
        dt_annos = convert_to_kitti_annos(results, dataset.data_infos,
                                          d.classes)
        gt_annos = [info['annos'] for info in dataset.data_infos]
        return kitti_eval(gt_annos, dt_annos, list(d.classes),
                          eval_types=('bbox', 'bev', '3d'))

    if d.dataset == 'nuscenes':
        from .nuscenes_eval import nuscenes_nds
        gt_annos = []
        for i in range(len(dataset.data_infos)):
            ann = dataset.get_ann_info(i)
            gt_annos.append(dict(boxes=ann['gt_bboxes_3d'],
                                 labels=ann['gt_labels_3d']))
        return nuscenes_nds(gt_annos, results, d.classes)

    from .indoor_eval import indoor_eval
    gt_annos = []
    for i in range(len(dataset.data_infos)):
        ann = dataset.get_ann_info(i)
        gt_annos.append(dict(boxes=ann['gt_bboxes_3d'],
                             labels=ann['gt_labels_3d']))
    # SunRgbdPerspectiveMultiViewDataset / Total3D evaluate at IoU 0.15
    # (reference sunrgbd_monocular_dataset.py:84-99, :103-151)
    iou_thrs = ((0.15,) if ('perspective' in preset_name
                            or 'total' in preset_name) else (0.25, 0.5))
    metrics = indoor_eval(gt_annos, results, d.classes, iou_thrs)
    if preset.model.layout_head is not None:
        gt_angles = np.stack([info['angles'] for info in dataset.data_infos])
        pr = np.stack([r['angles'] for r in results])
        metrics['pitch_mae'] = float(
            np.mean(np.abs(pr[:, 0] - gt_angles[:, 0])) * 180 / np.pi)
        metrics['roll_mae'] = float(
            np.mean(np.abs(pr[:, 1] - gt_angles[:, 1])) * 180 / np.pi)
        # layout_iou (sunrgbd_monocular_dataset.py:141-151): per-sample
        # rotated 3D IoU (the overlaps/NMS kernel convention) between the
        # predicted layout box and the GT layout, both bottom-center
        metrics['layout_iou'] = float(np.mean(layout_ious(
            np.stack([r['layout'] for r in results]),
            np.stack([info['layout'] for info in dataset.data_infos]))))
    return metrics


def layout_ious(pred_layouts_gc, gt_layouts_stored):
    """Aligned rotated-3D IoUs between predicted layout boxes
    (gravity-center, the LayoutHead output) and stored GT layouts
    (origin ``(.5, .5, .5)``) — the ``DepthInstance3DBoxes.overlaps`` call of
    ``sunrgbd_monocular_dataset.py:141-148``."""
    import jax
    import jax.numpy as jnp

    from ..ops import iou as iou_ops

    pred = np.asarray(pred_layouts_gc, np.float32).copy()
    pred[:, 2] -= pred[:, 5] / 2
    gt = np.asarray(gt_layouts_stored, np.float32).copy()
    gt[:, 2] -= gt[:, 5] / 2
    f = jax.jit(jax.vmap(
        lambda p, t: iou_ops.bbox_overlaps_3d(p[None], t[None])[0, 0]))
    return np.asarray(f(jnp.asarray(pred), jnp.asarray(gt)))


def build_val_dataset(preset, preset_name, data_root, ann_file, num_workers=4,
                      batch_size=None):
    """Test-mode dataset + loader for a preset's val split."""
    import jax

    from ..configs.presets import get_preset  # noqa: F401  (doc pointer)
    from ..data.datasets import DATASETS
    from ..data.loader import DataLoader
    from ..data.pipeline import ImagePipelineConfig

    d = preset.data
    img_cfg = ImagePipelineConfig(
        test_scale=d.test_size, pad_size=(d.test_size[1], d.test_size[0]),
        fixed_size_resize=(d.dataset == 'scannet'))
    ds_key = d.dataset
    if preset.model.layout_head is not None:
        ds_key = 'sunrgbd_total'
    dataset = DATASETS[ds_key](
        data_root, ann_file, d.classes, img_cfg,
        n_images=d.n_images_test, max_gt=d.max_gt, test_mode=True)
    if batch_size is None:
        batch_size = max(1, len(jax.devices()))
    images_dtype = None
    if preset.model.compute_dtype == 'bfloat16':
        import ml_dtypes
        images_dtype = ml_dtypes.bfloat16   # see data/loader.py: bit-identical
    loader = DataLoader(dataset, batch_size, train=False,
                        num_workers=num_workers, drop_last=False,
                        images_dtype=images_dtype)
    return dataset, loader
