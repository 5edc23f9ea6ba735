"""Table-driven config-fidelity sweep: every knob of every one of the 14
presets pinned to literal constants transcribed from the matching reference
config file ``/root/reference/configs/imvoxelnet/<name>.py`` (cited per
family below).  Pure-python assertions — no tracing, runs in milliseconds.
"""

import pytest

from imvoxelnet_tpu.configs.presets import PRESETS

INF = 1e8

# Shared schedule block, identical in all 14 reference configs
# (e.g. imvoxelnet_kitti.py:146-152):
#   lr=0.0001, grad_clip max_norm=35, step=[8, 11], total_epochs=12
SCHEDULE = dict(lr=1e-4, grad_clip_norm=35.0, lr_steps=(8, 11),
                total_epochs=12, weight_decay=1e-4, backbone_lr_mult=0.1)

# Shared SUN RGB-D data block (imvoxelnet_sunrgbd.py:50-76 and siblings):
# train 'range' multiscale (512,384)-(768,576), test (640,480), flip .5
# (except Total3D: no RandomFlip in pipeline — imvoxelnet_total_sunrgbd.py:61-66),
# samples_per_gpu=4.
_SUNRGBD_DATA = dict(n_images_train=1, n_images_test=1, samples_per_device=4,
                     test_size=(640, 480),
                     train_scales=((512, 384), (768, 576)), flip_ratio=0.5)
# Shared indoor v1 head block (imvoxelnet_sunrgbd.py:30-38):
_INDOOR_V1 = dict(version=1, n_convs=0, nms_pre=1000, iou_thr=0.15,
                  regress_ranges=((-1.0, 0.75), (0.75, 1.5), (1.5, INF)),
                  n_voxels=(80, 80, 32), voxel_size=(.08, .08, .08))
# Shared indoor v2 "_fast" head block (imvoxelnet_sunrgbd_fast.py:27-38):
_INDOOR_FAST = dict(version=2, centerness_topk=18, limit=27, nms_pre=1000,
                    n_voxels=(40, 40, 16), voxel_size=(.16, .16, .16))

# Per-preset expected knobs.  Keys resolve via _lookup below.
EXPECTED = {
    # --- imvoxelnet_kitti.py:29-65 (head/test_cfg), :78-112 (data) ---
    'imvoxelnet_kitti': dict(
        n_voxels=(216, 248, 12), voxel_size=(.32, .32, .32),
        anchor_ranges=((0, -39.68, -1.78, 69.12 - .32, 39.68 - .32, -1.78),),
        anchor_sizes=((1.6, 3.9, 1.56),), anchor_rotations=(0.0, 1.57),
        dir_offset=0.0, loss_bbox_weight=2.0,
        pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45,
        nms_pre=100, iou_thr=0.01, score_thr=0.1, max_out=50,
        n_images_train=1, n_images_test=1, samples_per_device=4,
        repeat_times=3, train_scales=((1173, 352), (1387, 416)),
        test_size=(1280, 384), flip_ratio=0.5, **SCHEDULE),
    # --- imvoxelnet_nuscenes.py:30-68, :89-117 ---
    'imvoxelnet_nuscenes': dict(
        n_voxels=(312, 312, 12), voxel_size=(.32, .32, .32),
        anchor_ranges=((-49.92, -49.92, -1.0,
                        49.92 - .32 * 2, 49.92 - .32 * 2, -1.0),),
        anchor_sizes=((1.98, 4.67, 1.74),), anchor_rotations=(0.0, 1.57),
        dir_offset=0.7854, dir_limit_offset=0.0, loss_bbox_weight=1.0,
        pos_iou_thr=0.6, neg_iou_thr=0.3, min_pos_iou=0.3,
        nms_pre=1000, iou_thr=0.2, score_thr=0.05, max_out=500,
        n_images_train=6, n_images_test=6, samples_per_device=1,
        repeat_times=1, train_scales=None, test_size=(1600, 928),
        flip_ratio=0.0, stage_with_dcn=(False, False, True, True),
        **SCHEDULE),
    # --- imvoxelnet_sunrgbd{,_top27,_fast}.py (times=2 at :76) ---
    'imvoxelnet_sunrgbd': dict(
        n_reg_outs=7, centerness_topk=-1, score_thr=0.05, repeat_times=2,
        **_INDOOR_V1, **_SUNRGBD_DATA, **SCHEDULE),
    'imvoxelnet_sunrgbd_top27': dict(
        n_reg_outs=7, centerness_topk=28, score_thr=0.0, repeat_times=2,
        **_INDOOR_V1, **_SUNRGBD_DATA, **SCHEDULE),
    'imvoxelnet_sunrgbd_fast': dict(
        n_reg_outs=7, score_thr=0.0, iou_thr=0.15, repeat_times=2,
        **_INDOOR_FAST, **_SUNRGBD_DATA, **SCHEDULE),
    # --- imvoxelnet_perspective_sunrgbd{,_top27,_fast}.py (times=2;
    #     _fast score_thr=.01 at imvoxelnet_perspective_sunrgbd_fast.py:38) ---
    'imvoxelnet_perspective_sunrgbd': dict(
        n_reg_outs=7, centerness_topk=-1, score_thr=0.05, repeat_times=2,
        n_classes=30, **_INDOOR_V1, **_SUNRGBD_DATA, **SCHEDULE),
    'imvoxelnet_perspective_sunrgbd_top27': dict(
        n_reg_outs=7, centerness_topk=28, score_thr=0.0, repeat_times=2,
        n_classes=30, **_INDOOR_V1, **_SUNRGBD_DATA, **SCHEDULE),
    'imvoxelnet_perspective_sunrgbd_fast': dict(
        n_reg_outs=7, score_thr=0.01, iou_thr=0.15, repeat_times=2,
        n_classes=30, **_INDOOR_FAST, **_SUNRGBD_DATA, **SCHEDULE),
    # --- imvoxelnet_total_sunrgbd{,_top27,_fast}.py (times=1 at :85;
    #     no RandomFlip; _top27 regress_ranges at
    #     imvoxelnet_total_sunrgbd_top27.py:39; loss weights 100/1 at
    #     imvoxelnet_total_sunrgbd.py:18-19) ---
    'imvoxelnet_total_sunrgbd': dict(
        n_reg_outs=7, centerness_topk=-1, score_thr=0.05, repeat_times=1,
        n_classes=33, has_layout_head=True,
        **{**_INDOOR_V1, **_SUNRGBD_DATA, 'flip_ratio': 0.0}, **SCHEDULE),
    'imvoxelnet_total_sunrgbd_top27': dict(
        n_reg_outs=7, centerness_topk=28, score_thr=0.0, repeat_times=1,
        n_classes=33, has_layout_head=True,
        **{**_INDOOR_V1, **_SUNRGBD_DATA, 'flip_ratio': 0.0,
           'regress_ranges': ((-1e8, .6), (.4, 1.1), (0.9, 1e8))},
        **SCHEDULE),
    'imvoxelnet_total_sunrgbd_fast': dict(
        n_reg_outs=7, score_thr=0.0, iou_thr=0.15, repeat_times=1,
        n_classes=33, has_layout_head=True,
        **{**_INDOOR_FAST, **_SUNRGBD_DATA, 'flip_ratio': 0.0}, **SCHEDULE),
    # --- imvoxelnet_scannet{,_top27,_fast}.py (times=3 at :81;
    #     train 20 views / test 50 at :52,:66; 640x480 fixed;
    #     _fast iou_thr .25 / score_thr .01 at imvoxelnet_scannet_fast.py:36-38) ---
    'imvoxelnet_scannet': dict(
        n_reg_outs=6, centerness_topk=-1, score_thr=0.0, repeat_times=3,
        n_classes=18, n_images_train=20, n_images_test=50,
        samples_per_device=1, test_size=(640, 480), train_scales=None,
        flip_ratio=0.0, **_INDOOR_V1, **SCHEDULE),
    'imvoxelnet_scannet_top27': dict(
        n_reg_outs=6, centerness_topk=28, score_thr=0.0, repeat_times=3,
        n_classes=18, n_images_train=20, n_images_test=50,
        samples_per_device=1, test_size=(640, 480), train_scales=None,
        flip_ratio=0.0, **_INDOOR_V1, **SCHEDULE),
    'imvoxelnet_scannet_fast': dict(
        n_reg_outs=6, score_thr=0.01, iou_thr=0.25, repeat_times=3,
        n_classes=18, n_images_train=20, n_images_test=50,
        samples_per_device=1, test_size=(640, 480), train_scales=None,
        flip_ratio=0.0, **_INDOOR_FAST, **SCHEDULE),
}


def _lookup(preset, knob):
    """Resolve a knob name to its value in the Preset dataclass tree."""
    model, data = preset.model, preset.data
    head = model.anchor_head if model.head_kind == 'anchor3d' \
        else model.indoor_head
    if knob == 'has_layout_head':
        return model.layout_head is not None
    if knob == 'n_classes':
        return head.n_classes if model.head_kind == 'indoor' \
            else head.num_classes
    if knob in ('pos_iou_thr', 'neg_iou_thr', 'min_pos_iou'):
        return getattr(head.assigner, knob)
    for obj in (preset, data, model, head):
        if hasattr(obj, knob):
            return getattr(obj, knob)
    raise AssertionError(f'unknown knob {knob!r}')


@pytest.mark.parametrize('name', sorted(EXPECTED))
def test_preset_matches_reference_config(name):
    preset = PRESETS[name]
    expected = EXPECTED[name]
    mismatches = {
        knob: (got, want)
        for knob, want in expected.items()
        if (got := _lookup(preset, knob)) != want
    }
    assert not mismatches, f'{name}: {mismatches}'


def test_all_14_reference_configs_covered():
    assert len(EXPECTED) == 14
    missing = set(EXPECTED) - set(PRESETS)
    assert not missing, missing
