"""Full-loop validation: overfit a synthetic scene and verify detection.

Fabricates a KITTI frame with one Car and a bright blob at its projected
image location, trains the tiny preset for 240 steps, and requires the
detector to localise it (measured run: 1 detection at score 0.89, 3D IoU
0.978 vs GT, KITTI protocol AP = the perfect-single-detection value).  This
exercises every layer end-to-end: info pkl -> pipeline geometry -> voxel
backprojection -> model -> losses/targets -> NMS -> lidar->camera conversion
-> eval protocol.  Run on CPU:

    PALLAS_AXON_POOL_IPS= python tools/validate_learning.py
"""
import os, pickle, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax                      # sitecustomize already imported jax with the
jax.config.update('jax_platforms', 'cpu')  # axon plugin; env alone is too late
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, cv2, jax, jax.numpy as jnp

root = '/tmp/kitti_learn'  # scratch fixture dir
os.makedirs(root + '/training/image_2', exist_ok=True)
rng = np.random.RandomState(0)

with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl', 'rb') as f:
    base = pickle.load(f)[0]
# fabricate a Car in front of the camera with a bright blob at its projection
calib = base['calib']
rect, trv2c, p2 = (calib['R0_rect'].astype(np.float32),
                   calib['Tr_velo_to_cam'].astype(np.float32),
                   calib['P2'].astype(np.float32))
cam_loc = np.array([2.0, 1.5, 15.0])   # x right, y down-bottom, z forward
img = rng.randint(0, 60, (375, 1242, 3), np.uint8)
uvw = p2[:3, :3] @ cam_loc + p2[:3, 3]
u, v = int(uvw[0]/uvw[2]), int(uvw[1]/uvw[2])
cv2.rectangle(img, (u-40, v-35), (u+40, v+15), (255, 255, 255), -1)
cv2.imwrite(root + '/training/image_2/000000.png', img)

info = dict(base)
info['annos'] = dict(
    name=np.array(['Car']),
    truncated=np.zeros(1), occluded=np.zeros(1, np.int64),
    alpha=np.array([0.0]),
    bbox=np.array([[u-40, v-35, u+40, v+15]], np.float64),
    dimensions=np.array([[3.9, 1.56, 1.6]]),  # (l, h, w)
    location=cam_loc[None],
    rotation_y=np.array([0.0]),
    score=np.zeros(1), index=np.zeros(1, np.int32),
    group_ids=np.zeros(1, np.int32), difficulty=np.zeros(1, np.int32),
)
with open(root + '/kitti_infos_train.pkl', 'wb') as f:
    pickle.dump([info], f)

from imvoxelnet_tpu.configs.presets import get_preset
from imvoxelnet_tpu.data.datasets import KittiMultiViewDataset
from imvoxelnet_tpu.data.pipeline import ImagePipelineConfig
from imvoxelnet_tpu.models.detector import ImVoxelNet, imvoxelnet_predict
from imvoxelnet_tpu.parallel import train as train_lib

preset = get_preset('tiny_kitti_test')
d = preset.data
img_cfg = ImagePipelineConfig(test_scale=d.test_size,
                              pad_size=(d.test_size[1], d.test_size[0]))
ds = KittiMultiViewDataset(root, root + '/kitti_infos_train.pkl',
                           ('Car',), img_cfg, max_gt=8)
srng = np.random.RandomState(0)
batch = ds.collate([ds.get_sample(0, train=False, rng=srng)])

model = ImVoxelNet(preset.model)
tx = train_lib.make_optimizer(3e-3, 1e-4, 0.1, 35.0, 1000)
state = train_lib.create_train_state(model, tx, jax.random.PRNGKey(0), batch)
step = jax.jit(train_lib.make_train_step(model, tx))
for i in range(240):
    state, m = step(state, batch)
    if i % 30 == 0:
        print('step', i, {k: round(float(v), 4) for k, v in m.items()}, flush=True)

variables = {'params': state.params, 'batch_stats': state.batch_stats}
outs = model.apply(variables, batch, train=False)
pred = jax.device_get(imvoxelnet_predict(preset.model, *outs, batch))
valid = pred['valid'][0]
print('detections:', int(valid.sum()), 'top score:',
      float(pred['scores'][0].max()))

from imvoxelnet_tpu.eval.kitti_eval import convert_to_kitti_annos, kitti_eval
results = [dict(boxes=pred['boxes'][0][valid], scores=pred['scores'][0][valid],
                labels=pred['labels'][0][valid])]
dt = convert_to_kitti_annos(results, [info], ('Car',))
from imvoxelnet_tpu.eval.kitti_eval import d3_box_overlap
gt_full = np.concatenate([info['annos']['location'],
                          info['annos']['dimensions'],
                          info['annos']['rotation_y'][:, None]], 1)
dt_full = np.concatenate([dt[0]['location'], dt[0]['dimensions'],
                          dt[0]['rotation_y'][:, None]], 1)
print('pred cam boxes:', np.round(dt_full, 2))
print('gt cam box:', np.round(gt_full, 2))
print('3d IoU:', np.round(d3_box_overlap(dt_full, gt_full)[:, 0], 3))
metrics = kitti_eval([info['annos']], dt, ['Car'], eval_types=('3d', 'bev'))
for k in ('KITTI/Car_BEV_easy', 'KITTI/Car_BEV_easy_loose',
          'KITTI/Car_BEV_moderate_loose', 'KITTI/Car_3D_moderate_loose'):
    print(k, metrics[k])
assert metrics['KITTI/Car_BEV_moderate_loose'] > 0
print('LEARNING LOOP OK')
