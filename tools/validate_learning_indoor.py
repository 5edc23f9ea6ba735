"""Indoor full-loop validation: overfit a synthetic SUN RGB-D scene.

Fabricates a SUN RGB-D sample (column-major K, Rt axis-swap conventions) with
one box and a bright blob at its projected image location, overfits a tiny
indoor (SunRgbd v1) model, and requires indoor_eval mAP@0.25 == 1.0 —
validating the indoor geometry chain end-to-end (K transpose, Rt swap, the
fixed [0, 3, -1] origin, gravity-center conversions, rotated decode + NMS).

    PALLAS_AXON_POOL_IPS= python tools/validate_learning_indoor.py
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

    root = '/tmp/sunrgbd_learn'
    os.makedirs(root + '/image', exist_ok=True)
    rng = np.random.RandomState(0)

    # camera: 640x480, fx=fy=400; depth-frame box at (0.5, 3.0, -0.5)
    fx, cx, cy = 400.0, 320.0, 240.0
    k_colmajor = np.array([[fx, 0, 0], [0, fx, 0], [cx, cy, 1]], np.float64)
    box = np.array([0.5, 3.0, -0.5, 1.0, 1.0, 1.0, 0.3])   # gravity z = 0
    # dataset extrinsic (Rt=I): cam = (x, -z, y) of the depth frame
    gc = np.array([box[0], box[1], box[2] + box[5] / 2])
    cam = np.array([gc[0], -gc[2], gc[1]])
    u = int(fx * cam[0] / cam[2] + cx)
    v = int(fx * cam[1] / cam[2] + cy)
    img = rng.randint(0, 60, (480, 640, 3), np.uint8)
    cv2.rectangle(img, (u - 60, v - 60), (u + 60, v + 60),
                  (255, 255, 255), -1)
    cv2.imwrite(root + '/image/000001.jpg', img)

    info = dict(
        image=dict(image_idx=1, image_path='image/000001.jpg',
                   image_shape=np.array([480, 640], np.int32)),
        calib=dict(K=k_colmajor.reshape(-1), Rt=np.eye(3)),
        annos=dict(gt_num=1,
                   gt_boxes_upright_depth=box[None],
                   name=np.array(['bed']),
                   **{'class': np.array([0])}),
    )
    with open(root + '/infos.pkl', 'wb') as f:
        pickle.dump([info], f)

    from imvoxelnet_tpu.data.datasets import SunRgbdMultiViewDataset
    from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
    from imvoxelnet_tpu.eval.indoor_eval import indoor_eval
    from imvoxelnet_tpu.models.detector import (
        ImVoxelNet, ImVoxelNetConfig, NeckConfig, imvoxelnet_predict)
    from imvoxelnet_tpu.models.heads.imvoxel_heads import IndoorHeadConfig
    from imvoxelnet_tpu.ops import iou as iou_ops
    from imvoxelnet_tpu.parallel import train as train_lib

    img_cfg = ImagePipelineConfig(test_scale=(320, 256), pad_size=(256, 320))
    ds = SunRgbdMultiViewDataset(root, root + '/infos.pkl', ('bed',),
                                 img_cfg, max_gt=4)
    batch = ds.collate([ds.get_sample(0, False, np.random.RandomState(0))])

    head = IndoorHeadConfig(
        n_classes=1, n_reg_outs=7, voxel_size=(0.4, 0.4, 0.4),
        dataset='sunrgbd', version=1, nms_pre=128, score_thr=0.05,
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
    pred = jax.device_get(imvoxelnet_predict(cfg, *outs, batch))
    valid = pred['valid'][0]
    boxes = pred['boxes'][0][valid]
    print('detections:', int(valid.sum()), 'top score:',
          float(pred['scores'][0].max()))
    print('pred box:', np.round(boxes[:1], 3))
    print('gt box  :', np.round(box, 3))

    iou = iou_ops.bbox_overlaps_3d(jnp.asarray(boxes[:1], jnp.float32),
                                   jnp.asarray(box[None], jnp.float32))
    print('3d IoU:', float(iou[0, 0]))

    metrics = indoor_eval(
        [dict(boxes=box[None], labels=np.array([0]))],
        [dict(boxes=boxes, scores=pred['scores'][0][valid],
              labels=pred['labels'][0][valid])],
        ('bed',), iou_thrs=(0.25,))
    print('mAP@0.25:', metrics['mAP_0.25'])
    assert metrics['mAP_0.25'] > 0.99, metrics
    print('INDOOR LEARNING LOOP OK')


if __name__ == '__main__':
    main()
