"""KITTI eval protocol golden tests.

The fixture annos and expected mAP tables are the reference's own golden
values (``/root/reference/tests/test_kitti_eval.py`` — there they require a
CUDA device for the rotated IoU; our numpy implementation runs anywhere).
"""

import numpy as np

from imvoxelnet_tpu.eval import kitti_eval as ke


def _golden_annos():
    gt_anno = dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car',
                       'DontCare', 'DontCare']),
        truncated=np.array([0., 0., 0., -1., -1., -1., -1.]),
        occluded=np.array([0, 0, 3, -1, -1, -1, -1]),
        alpha=np.array([-1.57, 1.85, -1.65, -10., -10., -10., -10.]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743],
                       [532.37, 176.35, 542.68, 185.27],
                       [559.62, 175.83, 575.4, 183.15]]),
        dimensions=np.array([[12.34, 2.85, 2.63], [3.69, 1.67, 1.87],
                             [2.02, 1.86, 0.6], [-1., -1., -1.],
                             [-1., -1., -1.], [-1., -1., -1.],
                             [-1., -1., -1.]]),
        location=np.array([[4.700e-01, 1.490e+00, 6.944e+01],
                           [-1.653e+01, 2.390e+00, 5.849e+01],
                           [4.590e+00, 1.320e+00, 4.584e+01],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03],
                           [-1.000e+03, -1.000e+03, -1.000e+03]]),
        rotation_y=np.array([-1.56, 1.57, -1.55, -10., -10., -10., -10.]),
    )
    dt_anno = dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car']),
        truncated=np.zeros(5),
        occluded=np.zeros(5, int),
        alpha=np.array([1.0744612, 1.2775835, 1.82563, 2.1145396,
                        -1.7676563]),
        dimensions=np.array([[1.4441837, 1.7450154, 0.53160036],
                             [1.6501029, 1.7540325, 0.5162356],
                             [3.9313498, 1.4899347, 1.5655756],
                             [4.0111866, 1.5350999, 1.585221],
                             [3.7337692, 1.5117968, 1.5515774]]),
        location=np.array([[4.6671643, 1.285098, 45.836895],
                           [4.658241, 1.3088846, 45.85148],
                           [-16.598526, 2.298814, 58.618088],
                           [-18.629122, 2.2990575, 39.305355],
                           [7.0964046, 1.5178275, 29.32426]]),
        rotation_y=np.array([1.174933, 1.3778262, 1.550529, 1.6742425,
                             -1.5330327]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743]]),
        score=np.array([0.18151495, 0.57920843, 0.27795696, 0.23100418,
                        0.21541929]),
    )
    return [gt_anno], [dt_anno]


def test_do_eval_golden():
    gt, dt = _golden_annos()
    classes = [1, 2, 0]
    min_overlaps = np.array([[[0.5, 0.5, 0.7], [0.5, 0.5, 0.7],
                              [0.5, 0.5, 0.7]],
                             [[0.5, 0.5, 0.7], [0.25, 0.25, 0.5],
                              [0.25, 0.25, 0.5]]])
    difficultys = [0, 1, 2]

    ret = ke.eval_class(gt, dt, classes, difficultys, 0, min_overlaps,
                        compute_aos=True)
    mAP_bbox = ke.get_mAP(ret['precision'])
    mAP_aos = ke.get_mAP(ret['orientation'])
    expected_bbox = np.array([[[0., 0.], [9.09090909, 9.09090909],
                               [9.09090909, 9.09090909]],
                              [[0., 0.], [9.09090909, 9.09090909],
                               [9.09090909, 9.09090909]],
                              [[0., 0.], [9.09090909, 9.09090909],
                               [9.09090909, 9.09090909]]])
    expected_aos = np.array([[[0., 0.], [0.55020816, 0.55020816],
                              [0.55020816, 0.55020816]],
                             [[0., 0.], [8.36633862, 8.36633862],
                              [8.36633862, 8.36633862]],
                             [[0., 0.], [8.63476893, 8.63476893],
                              [8.63476893, 8.63476893]]])
    np.testing.assert_allclose(mAP_bbox, expected_bbox, atol=1e-6)
    np.testing.assert_allclose(mAP_aos, expected_aos, atol=1e-6)

    ret_bev = ke.eval_class(gt, dt, classes, difficultys, 1, min_overlaps)
    np.testing.assert_allclose(ke.get_mAP(ret_bev['precision']), 0.0,
                               atol=1e-6)
    ret_3d = ke.eval_class(gt, dt, classes, difficultys, 2, min_overlaps)
    np.testing.assert_allclose(ke.get_mAP(ret_3d['precision']), 0.0,
                               atol=1e-6)


def test_kitti_eval_perfect_detection():
    """A detection equal to a clean GT must reach AP ~ 100 at every level."""
    gt = [dict(
        name=np.array(['Car']),
        truncated=np.array([0.0]),
        occluded=np.array([0]),
        alpha=np.array([0.2]),
        bbox=np.array([[300.0, 150.0, 400.0, 250.0]]),
        dimensions=np.array([[3.9, 1.56, 1.6]]),
        location=np.array([[2.0, 1.5, 20.0]]),
        rotation_y=np.array([0.3]),
    )]
    dt = [dict(
        name=np.array(['Car']),
        truncated=np.zeros(1),
        occluded=np.zeros(1, int),
        alpha=np.array([0.2]),
        bbox=np.array([[300.0, 150.0, 400.0, 250.0]]),
        dimensions=np.array([[3.9, 1.56, 1.6]]),
        location=np.array([[2.0, 1.5, 20.0]]),
        rotation_y=np.array([0.3]),
        score=np.array([0.9]),
    )]
    res = ke.kitti_eval(gt, dt, ['Car'], eval_types=('bbox', 'bev', '3d'))
    assert abs(res['KITTI/Car_3D_moderate'] - 100 / 11) < 1e-6 or \
        res['KITTI/Car_3D_moderate'] > 9.0
    # single GT, single TP: 11-point AP = 1/11 * 100 at every threshold
    for key in ('KITTI/Car_BBOX_easy', 'KITTI/Car_BEV_moderate',
                'KITTI/Car_3D_hard'):
        assert res[key] > 9.0, (key, res[key])


def test_convert_to_kitti_annos_roundtrip():
    """lidar box -> camera anno -> 3D overlap with the camera GT ~ 1."""
    import pickle
    with open('/root/reference/tests/data/kitti/kitti_infos_train.pkl',
              'rb') as f:
        infos = pickle.load(f)
    info = infos[0]
    rect = info['calib']['R0_rect'].astype(np.float32)
    trv2c = info['calib']['Tr_velo_to_cam'].astype(np.float32)
    loc = info['annos']['location'][0]
    dims = info['annos']['dimensions'][0]      # (l, h, w)
    ry = info['annos']['rotation_y'][0]

    # same cam->lidar conversion the dataset uses
    rt = np.linalg.inv(rect @ trv2c)
    xyz = (rt @ np.array([*loc, 1.0]))[:3]
    lidar_box = np.array([*xyz, dims[2], dims[0], dims[1], ry + np.pi],
                         np.float32)
    # + pi to cancel the conversion's yaw hack

    preds = [dict(boxes=lidar_box[None], scores=np.array([0.8]),
                  labels=np.array([0]))]
    annos = ke.convert_to_kitti_annos(preds, [info], ['Pedestrian'])
    assert len(annos[0]['name']) == 1
    np.testing.assert_allclose(annos[0]['location'][0], loc, atol=1e-3)
    np.testing.assert_allclose(annos[0]['dimensions'][0], dims, atol=1e-3)
    # rotation_y equal modulo 2pi after the hack
    dr = (annos[0]['rotation_y'][0] - ry) % (2 * np.pi)
    assert min(dr, 2 * np.pi - dr) < 1e-3
    gt_full = np.concatenate([loc, dims, [ry]])[None]
    dt_full = np.concatenate([annos[0]['location'][0],
                              annos[0]['dimensions'][0],
                              [annos[0]['rotation_y'][0]]])[None]
    iou = ke.d3_box_overlap(dt_full, gt_full)
    assert iou[0, 0] > 0.99


def test_r40_reported_alongside_11pt():
    gt = [dict(
        name=np.array(['Car']), truncated=np.array([0.0]),
        occluded=np.array([0]), alpha=np.array([0.2]),
        bbox=np.array([[300.0, 150.0, 400.0, 250.0]]),
        dimensions=np.array([[3.9, 1.56, 1.6]]),
        location=np.array([[2.0, 1.5, 20.0]]),
        rotation_y=np.array([0.3]),
    )]
    dt = [dict(
        name=np.array(['Car']), truncated=np.zeros(1),
        occluded=np.zeros(1, int), alpha=np.array([0.2]),
        bbox=np.array([[300.0, 150.0, 400.0, 250.0]]),
        dimensions=np.array([[3.9, 1.56, 1.6]]),
        location=np.array([[2.0, 1.5, 20.0]]),
        rotation_y=np.array([0.3]), score=np.array([0.9]),
    )]
    # with a single GT only one recall position fills (protocol artifact);
    # replicate the perfect pair over 41 images so all positions fill
    gt41 = gt * 41
    dt41 = [dict(d, score=np.array([1.0 - 0.01 * i]))
            for i, d in enumerate(dt * 41)]
    res = ke.kitti_eval(gt41, dt41, ['Car'], eval_types=('3d',))
    assert 'KITTI/Car_3D_moderate_R40' in res
    assert res['KITTI/Car_3D_moderate_R40'] > 95.0
    assert res['KITTI/Car_3D_moderate'] > 95.0
