"""ScanNet multi-view full-loop validation.

Three synthetic posed views of one axis-aligned box (bright blob at each
view's projected location), tiny ScanNet-style model (axis-aligned head +
aligned NMS), overfit, require indoor_eval mAP@0.25 == 1.0 — validating the
multi-view aggregation (per-frame extrinsics, mean pooling) and the ScanNet
conventions end-to-end.

    PALLAS_AXON_POOL_IPS= python tools/validate_learning_scannet.py
"""

import os
import pickle
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax                      # sitecustomize already imported jax with the
jax.config.update('jax_platforms', 'cpu')  # axon plugin; env alone is too late
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    root = '/tmp/scannet_learn'
    os.makedirs(root + '/posed_images/scene', exist_ok=True)
    rng = np.random.RandomState(0)

    # box (upright-depth, origin (.5,.5,.5)) near the grid center
    box_center = np.array([0.3, -0.2, 0.5])
    box = np.concatenate([box_center, [1.0, 1.0, 1.0]])
    fx, cx, cy = 300.0, 320.0, 240.0
    k = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]])

    # three cameras looking down the -? axis... place cameras on a circle
    # looking at the box: pose = camera-to-world (ScanNet convention);
    # the dataset uses extrinsic = inv(axis_align @ pose).
    poses = []
    for i, ang in enumerate((0.0, 0.4, -0.4)):
        # camera at distance 4 looking at the box along +x_world
        # camera axes: z_cam = viewing dir, x_cam = right, y_cam = down
        c, s = np.cos(ang), np.sin(ang)
        eye = box_center - 4.0 * np.array([c, s, 0.0])
        z_cam = np.array([c, s, 0.0])
        x_cam = np.array([-s, c, 0.0])
        y_cam = np.array([0.0, 0.0, -1.0])
        pose = np.eye(4)
        pose[:3, 0] = x_cam
        pose[:3, 1] = y_cam
        pose[:3, 2] = z_cam
        pose[:3, 3] = eye
        poses.append(pose)

        # project the box center into this view to place the blob
        w2c = np.linalg.inv(pose)
        pc = (w2c @ np.array([*box_center, 1.0]))[:3]
        u = int(fx * pc[0] / pc[2] + cx)
        v = int(fx * pc[1] / pc[2] + cy)
        img = rng.randint(0, 60, (480, 640, 3), np.uint8)
        cv2.rectangle(img, (u - 50, v - 50), (u + 50, v + 50),
                      (255, 255, 255), -1)
        cv2.imwrite(root + f'/posed_images/scene/{i}.jpg', img)

    info = dict(
        img_paths=[f'posed_images/scene/{i}.jpg' for i in range(3)],
        intrinsics=k,
        extrinsics=poses,
        annos=dict(gt_num=1,
                   axis_align_matrix=np.eye(4),
                   gt_boxes_upright_depth=box[None],
                   **{'class': np.array([0])}),
    )
    with open(root + '/infos.pkl', 'wb') as f:
        pickle.dump([info], f)

    from imvoxelnet_tpu.data.datasets import ScanNetMultiViewDataset
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.eval.indoor_eval import indoor_eval
    from imvoxelnet_tpu.models.detector import (
        ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_predict)
    from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig
    from imvoxelnet_tpu.parallel import train as train_lib

    img_cfg = ImagePipelineConfig(test_scale=(320, 256), pad_size=(256, 320))
    ds = ScanNetMultiViewDataset(root, root + '/infos.pkl', ('chair',),
                                 img_cfg, n_images=3, max_gt=4)
    batch = ds.collate([ds.get_sample(0, False, np.random.RandomState(0))])

    head = IndoorHeadConfig(
        n_classes=1, n_reg_outs=6, voxel_size=(0.4, 0.4, 0.4),
        dataset='scannet', version=1, nms_pre=128, score_thr=0.05,
        iou_thr=0.15, max_out=8, pre_nms_k=32)
    cfg = ImVoxelNetConfig(
        n_voxels=(16, 16, 8), voxel_size=(0.4, 0.4, 0.4),
        fpn_out_channels=16,
        neck=NeckConfig(kind='fast', in_channels=16, out_channels=16,
                        n_blocks=(1, 1, 1)),
        head_kind='indoor', anchor_head=None, indoor_head=head)

    model = ImVoxelNet(cfg)
    tx = train_lib.make_optimizer(3e-3, 1e-4, 0.1, 35.0, 1000)
    state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0),
                                         batch)
    step = jax.jit(train_lib.make_train_step(model, tx))
    for i in range(240):
        state, m = step(state, batch)
        if i % 60 == 0:
            print('step', i, {k: round(float(x), 4) for k, x in m.items()},
                  flush=True)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    outs = model.apply(variables, batch, train=False)
    # multi-view aggregation sanity: the box's voxel must be seen
    valid_mask = np.asarray(outs[1][0])
    print('seen voxels:', valid_mask.sum(), '/', valid_mask.size)

    pred = jax.device_get(imvoxelnet_predict(cfg, *outs, batch))
    valid = pred['valid'][0]
    boxes = pred['boxes'][0][valid]
    print('detections:', int(valid.sum()), 'top score:',
          float(pred['scores'][0].max()))
    print('pred box:', np.round(boxes[:1], 3))

    gt_bottom = box.copy()
    gt_bottom[2] -= box[5] / 2
    gt7 = np.concatenate([gt_bottom, [0.0]])
    print('gt box  :', np.round(gt7, 3))
    metrics = indoor_eval(
        [dict(boxes=gt7[None], labels=np.array([0]))],
        [dict(boxes=boxes, scores=pred['scores'][0][valid],
              labels=pred['labels'][0][valid])],
        ('chair',), iou_thrs=(0.25,))
    print('mAP@0.25:', metrics['mAP_0.25'])
    assert metrics['mAP_0.25'] > 0.99, metrics
    print('SCANNET MULTI-VIEW LEARNING LOOP OK')


if __name__ == '__main__':
    main()
