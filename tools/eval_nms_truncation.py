"""Protocol-level mAP impact of the ``pre_nms_k=256`` NMS truncation.

The shipping indoor default keeps only the top-256 candidates per class by
score before the rotated NMS (``IndoorHeadConfig.pre_nms_k``), where the
reference's ``box3d_multiclass_nms`` (``box3d_nms.py:8-88``) consumes all
``nms_pre * n_levels`` candidates uncapped.  ``tests/test_nms.py`` bounds the
divergence to the below-top-256 tail per class; this tool measures what that
tail is *worth at protocol level*: identical model outputs are decoded through
the exact path (``pre_nms_k=0``, bit-identical to the reference) and the
truncated path, and both go through ``indoor_eval`` mAP@0.25/@0.15.

Setup mirrors ``validate_learning_indoor.py`` scaled out: a synthetic
multi-class multi-box SUN RGB-D val split (class-colored blobs at projected
box locations), a tiny v1 head trained for a bounded number of steps so the
score distribution is realistic-imperfect (hundreds of above-zero candidates
per class under the ``_fast`` protocol's score_thr=0), then one shared
forward per scene and two NMS decodes.  The worst case for truncation is
exactly this regime: score_thr=0 floods the candidate list, and a weak model
ranks true positives deep into the tail.

    PALLAS_AXON_POOL_IPS= python tools/eval_nms_truncation.py --scenes 200

Results recorded in docs/parity.md ("pre_nms_k truncation").
"""

import argparse
import dataclasses
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This container's sitecustomize imports jax (registering the axon TPU
# plugin) before this module runs, so the JAX_PLATFORMS env var is too late
# here — only the config API still takes effect (same pinning note as
# __graft_entry__.dryrun_multichip).  Without it this "CPU" eval silently
# lands on the TPU and serializes with whatever training job owns the chip.
import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np

FX, CX, CY = 400.0, 320.0, 240.0
CLASSES = ('bed', 'table', 'chair')
# distinct base colors per class (BGR); intensity jittered per box
COLORS = ((255, 80, 80), (80, 255, 80), (80, 80, 255))


def make_scene(rng, root, idx):
    """One synthetic SUN RGB-D sample: boxes in the depth frame + an image
    with class-colored blobs at their projected locations."""
    import cv2
    n = rng.randint(2, 7)
    boxes, labels = [], []
    img = rng.randint(0, 60, (480, 640, 3)).astype(np.uint8)
    for _ in range(n):
        c = rng.randint(len(CLASSES))
        size = rng.uniform(0.6, 1.4, 3)
        center = np.array([rng.uniform(-1.5, 1.5), rng.uniform(2.5, 5.5),
                           rng.uniform(-1.0, 0.2)])
        yaw = rng.uniform(-np.pi / 2, np.pi / 2)
        box = np.concatenate([center - [0, 0, size[2] / 2], size, [yaw]])
        gc = np.array([box[0], box[1], box[2] + box[5] / 2])
        cam = np.array([gc[0], -gc[2], gc[1]])       # (x, -z, y), Rt = I
        u = int(FX * cam[0] / cam[2] + CX)
        v = int(FX * cam[1] / cam[2] + CY)
        # apparent size ~ focal * metric size / depth
        hw = max(8, int(FX * size[0] / (2 * cam[2])))
        hh = max(8, int(FX * size[2] / (2 * cam[2])))
        tint = rng.uniform(0.4, 1.0)                  # imperfect evidence
        color = tuple(int(ch * tint) for ch in COLORS[c])
        cv2.rectangle(img, (u - hw, v - hh), (u + hw, v + hh), color, -1)
        boxes.append(box)
        labels.append(c)
    path = f'image/{idx:06d}.jpg'
    cv2.imwrite(os.path.join(root, path), img)
    boxes = np.asarray(boxes, np.float64)
    k_colmajor = np.array([[FX, 0, 0], [0, FX, 0], [CX, CY, 1]], np.float64)
    info = dict(
        image=dict(image_idx=idx, image_path=path,
                   image_shape=np.array([480, 640], np.int32)),
        calib=dict(K=k_colmajor.reshape(-1), Rt=np.eye(3)),
        annos=dict(gt_num=n, gt_boxes_upright_depth=boxes,
                   name=np.array([CLASSES[c] for c in labels]),
                   **{'class': np.asarray(labels)}),
    )
    return info, dict(boxes=boxes, labels=np.asarray(labels))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--scenes', type=int, default=200,
                        help='val split size')
    parser.add_argument('--train-scenes', type=int, default=32)
    parser.add_argument('--steps', type=int, default=200)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--pre-nms-k', type=int, default=256,
                        help='the truncation under test')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    import jax

    from imvoxelnet_tpu.data.datasets import SunRgbdMultiViewDataset
    from imvoxelnet_tpu.data.loader import DataLoader
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.eval.indoor_eval import indoor_eval
    from imvoxelnet_tpu.models.detector import (
        ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_predict)
    from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig
    from imvoxelnet_tpu.parallel import train as train_lib

    rng = np.random.RandomState(args.seed)
    root = '/tmp/nms_truncation_eval'
    os.makedirs(os.path.join(root, 'image'), exist_ok=True)
    n_total = args.train_scenes + args.scenes
    infos, gts = [], []
    for i in range(n_total):
        info, gt = make_scene(rng, root, i)
        infos.append(info)
        gts.append(gt)
    with open(os.path.join(root, 'infos.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    print(f'{args.train_scenes} train + {args.scenes} val scenes at {root}')

    img_cfg = ImagePipelineConfig(test_scale=(320, 256), pad_size=(256, 320))
    ds = SunRgbdMultiViewDataset(root, os.path.join(root, 'infos.pkl'),
                                 CLASSES, img_cfg, max_gt=8)

    # the `_fast` protocol's test cfg shape: score_thr=0 floods the NMS with
    # every candidate — the regime where the top-k truncation bites hardest
    head = IndoorHeadConfig(
        n_classes=len(CLASSES), n_reg_outs=7, voxel_size=(0.32, 0.32, 0.32),
        dataset='sunrgbd', version=1, centerness_topk=18,
        nms_pre=1000, score_thr=0.0, iou_thr=0.15, max_out=1000,
        pre_nms_k=args.pre_nms_k)
    cfg = ImVoxelNetConfig(
        n_voxels=(20, 20, 8), voxel_size=(0.32, 0.32, 0.32),
        fpn_out_channels=16,
        neck=NeckConfig(kind='fast', in_channels=16, out_channels=16,
                        n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None, indoor_head=head,
        backbone_stage_blocks=(1, 1, 1, 1))

    model = ImVoxelNet(cfg)
    tx = train_lib.make_optimizer(3e-3, 1e-4, 0.1, 35.0, 1000)

    class TrainView:
        """First train_scenes samples of ds, loader-compatible."""

        def __init__(self, base, n):
            self.base, self.n = base, n

        def __len__(self):
            return self.n

        def get_sample(self, i, train, srng):
            return self.base.get_sample(i, train, srng)

        def collate(self, samples):
            return self.base.collate(samples)

    loader = DataLoader(TrainView(ds, args.train_scenes), args.batch_size,
                        train=True, num_workers=4)
    first = next(iter(loader.epoch(0)))
    state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0),
                                         first)
    step = jax.jit(train_lib.make_train_step(model, tx))
    k = 0
    while k < args.steps:
        for batch in loader.epoch(k // max(1, len(loader))):
            state, m = step(state, batch)
            k += 1
            if k % 50 == 0 or k == args.steps:
                print(f'step {k}:',
                      {n: round(float(x), 4) for n, x in m.items()},
                      flush=True)
            if k >= args.steps:
                break

    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    exact_cfg = dataclasses.replace(
        cfg, indoor_head=dataclasses.replace(head, pre_nms_k=0))

    @jax.jit
    def forward(batch):
        return model.apply(variables, batch, train=False)

    @jax.jit
    def decode_trunc(outs, batch):
        return imvoxelnet_predict(cfg, *outs, batch)

    @jax.jit
    def decode_exact(outs, batch):
        return imvoxelnet_predict(exact_cfg, *outs, batch)

    def collect(pred):
        out = []
        for b in range(pred['valid'].shape[0]):
            v = np.asarray(pred['valid'][b])
            out.append(dict(boxes=np.asarray(pred['boxes'][b])[v],
                            scores=np.asarray(pred['scores'][b])[v],
                            labels=np.asarray(pred['labels'][b])[v]))
        return out

    val_gts, trunc_dets, exact_dets = [], [], []
    vrng = np.random.RandomState(1)
    batch_idx = list(range(args.train_scenes, n_total))
    for s in range(0, len(batch_idx), args.batch_size):
        idxs = batch_idx[s:s + args.batch_size]
        batch = ds.collate([ds.get_sample(i, False, vrng) for i in idxs])
        outs = forward(batch)
        trunc = jax.device_get(decode_trunc(outs, batch))
        exact = jax.device_get(decode_exact(outs, batch))
        trunc_dets.extend(collect(trunc)[:len(idxs)])
        exact_dets.extend(collect(exact)[:len(idxs)])
        val_gts.extend(gts[i] for i in idxs)
        if (s // args.batch_size) % 5 == 0:
            print(f'decoded {s + len(idxs)}/{len(batch_idx)} val scenes',
                  flush=True)

    results = {}
    for name, dets in (('exact', exact_dets),
                       (f'pre_nms_k={args.pre_nms_k}', trunc_dets)):
        m = indoor_eval(val_gts, dets, CLASSES, iou_thrs=(0.25, 0.15))
        results[name] = m
        print(name, {k: round(v, 4) for k, v in m.items()
                     if k.startswith('mAP')})
    for thr in ('0.25', '0.15'):
        key = f'mAP_{thr}'
        delta = (results[f'pre_nms_k={args.pre_nms_k}'][key]
                 - results['exact'][key])
        print(f'delta {key}: {delta:+.4f} '
              f'(exact {results["exact"][key]:.4f})')
    n_det = [len(d['boxes']) for d in exact_dets]
    print(f'mean detections/scene (exact): {np.mean(n_det):.1f}, '
          f'max {max(n_det)}')


if __name__ == '__main__':
    main()
