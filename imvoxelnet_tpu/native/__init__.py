"""ctypes loader for the native eval kernels.

Compiles ``eval_kernels.cc`` with g++ on first use (no pybind11 in the image;
plain C ABI + ctypes).  ``load()`` returns None when no compiler is available
— callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'eval_kernels.cc')
_SO = os.path.join(_DIR, 'eval_kernels.so')

_lib = None
_tried = False


def _build_and_load(src, so):
    """Compile (atomically: tmp + rename, safe under concurrent loaders) and
    CDLL a C ABI shared object; None when no compiler is available."""
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            tmp = f'{so}.{os.getpid()}.tmp'
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                            src, '-o', tmp], check=True, capture_output=True)
            os.replace(tmp, so)  # atomic on POSIX — never a truncated .so
        return ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib = _build_and_load(_SRC, _SO)
    if lib is None:
        return None

    lib.rect_intersection_areas.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.compute_statistics_thresholds.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.rotated_nms_host.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def _ptr(a, typ=ctypes.c_double):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def rect_intersection_areas(boxes1, boxes2):
    lib = load()
    assert lib is not None
    b1 = np.ascontiguousarray(boxes1, np.float64)
    b2 = np.ascontiguousarray(boxes2, np.float64)
    out = np.zeros((len(b1), len(b2)), np.float64)
    lib.rect_intersection_areas(_ptr(b1), len(b1), _ptr(b2), len(b2),
                                _ptr(out))
    return out


def compute_statistics_thresholds(overlaps, dt_scores, dt_alphas, gt_alphas,
                                  ignored_gt, ignored_det, dc_overlaps,
                                  min_overlap, thresholds, compute_aos,
                                  out_pr):
    lib = load()
    assert lib is not None
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    n_dt, n_gt = overlaps.shape
    dc = np.ascontiguousarray(dc_overlaps, np.float64)
    n_dc = dc.shape[1] if dc.size else 0
    lib.compute_statistics_thresholds(
        _ptr(overlaps), n_dt, n_gt,
        _ptr(np.ascontiguousarray(dt_scores, np.float64)),
        _ptr(np.ascontiguousarray(dt_alphas, np.float64)),
        _ptr(np.ascontiguousarray(gt_alphas, np.float64)),
        _ptr(np.ascontiguousarray(ignored_gt, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(ignored_det, np.int64), ctypes.c_int64),
        _ptr(dc) if n_dc else _ptr(np.zeros(1)), n_dc,
        float(min_overlap),
        _ptr(np.ascontiguousarray(thresholds, np.float64)), len(thresholds),
        int(compute_aos), _ptr(out_pr))


def rotated_nms_host(boxes_xywhr, scores, iou_thr):
    lib = load()
    assert lib is not None
    b = np.ascontiguousarray(boxes_xywhr, np.float64)
    s = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros(len(b), np.uint8)
    lib.rotated_nms_host(_ptr(b), _ptr(s), len(b), float(iou_thr),
                         _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


# ---------------------------------------------------------------------------
# Fused image preprocessing (image_ops.cc) — data-loader hot path
# ---------------------------------------------------------------------------

_IMG_SRC = os.path.join(_DIR, 'image_ops.cc')
_IMG_SO = os.path.join(_DIR, 'image_ops.so')

_img_lib = None
_img_tried = False


def load_image_ops():
    global _img_lib, _img_tried
    if _img_lib is not None or _img_tried:
        return _img_lib
    _img_tried = True
    lib = _build_and_load(_IMG_SRC, _IMG_SO)
    if lib is None:
        return None
    lib.normalize_pad_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    _img_lib = lib
    return _img_lib


def normalize_pad_u8(img_u8, mean, std, pad_hw):
    """Fused (u8 -> normalized f32, zero-padded) single pass, or None.

    Returns None when the native library is unavailable — callers fall back
    to the numpy normalize+pad pair (bit-identical results either way).
    """
    lib = load_image_ops()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img.shape[:2]
    ph, pw = pad_hw
    if h > ph or w > pw:
        # preserve pad_to's invariant: fall back so the numpy path raises its
        # loud AssertionError instead of the C kernel writing out of bounds
        return None
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((ph, pw, 3), np.float32)
    lib.normalize_pad_u8(_ptr(img, ctypes.c_uint8), h, w,
                         _ptr(mean, ctypes.c_float),
                         _ptr(std, ctypes.c_float),
                         _ptr(out, ctypes.c_float), ph, pw)
    return out
