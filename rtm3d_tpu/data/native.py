"""ctypes binding for the native preprocessing library (native/preproc.cc).

Replaces the reference's OpenCV-per-op host path (cv2.warpAffine + pad +
normalize, reference: preprocess/transforms.py:346, dataset_reader.py:63-69,
175-195) with one fused C++ pass per image, thread-pooled across the batch.
Falls back silently when the shared library hasn't been built
(``make -C native``) — every caller has a numpy/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    default = os.path.join(_repo_root(), "native", "libpreproc.so")
    override = os.environ.get("RTM3D_PREPROC_LIB", "")
    if not (override and os.path.exists(override)) and not os.path.exists(default):
        # build artifacts are not tracked in git — build on first use
        # (serialized across forked loader workers, timeout-bounded, stderr
        # surfaced via warnings); missing toolchain just means native mode
        # stays unavailable
        from rtm3d_tpu.utils.native_build import build_native_target

        build_native_target(os.path.join(_repo_root(), "native"), "libpreproc.so")
    candidates = [override, default]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.rtm3d_warp_normalize.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, f32p, f32p,
                f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
            ]
            lib.rtm3d_warp_normalize_batch.argtypes = [
                ctypes.POINTER(u8p), i32p, i32p, f32p, f32p,
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
            ]
            lib.rtm3d_splat_heatmap.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                i32p, i32p, f32p, f32p, u8p, u8p, ctypes.c_int,
            ]
            lib.rtm3d_version.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return load_library() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_normalize(
    src: np.ndarray,
    M: np.ndarray,
    out_hw,
    mean: np.ndarray,
    std: np.ndarray,
    border: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused affine warp + border fill + normalize. src uint8 (H, W, 3),
    M forward 2x3 (src->dst, cv2.warpAffine convention). Returns float32
    (out_h, out_w, 3)."""
    lib = load_library()
    assert lib is not None, "native library not built (make -C native)"
    src = np.ascontiguousarray(src, np.uint8)
    Mf = np.ascontiguousarray(M, np.float32).reshape(6)
    if border is None:
        border = src.reshape(-1, 3).mean(axis=0)
    border = np.ascontiguousarray(border, np.float32)
    mean = np.ascontiguousarray(mean, np.float32).reshape(3)
    std = np.ascontiguousarray(std, np.float32).reshape(3)
    oh, ow = out_hw
    dst = np.empty((oh, ow, 3), np.float32)
    lib.rtm3d_warp_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1], _fptr(Mf), _fptr(border),
        _fptr(dst), oh, ow, _fptr(mean), _fptr(std),
    )
    return dst


def warp_normalize_batch(srcs, Ms, out_hw, mean, std, borders=None) -> np.ndarray:
    """Thread-pooled batch variant; sources may differ in size."""
    lib = load_library()
    assert lib is not None, "native library not built (make -C native)"
    n = len(srcs)
    oh, ow = out_hw
    srcs = [np.ascontiguousarray(s, np.uint8) for s in srcs]
    Ms = np.ascontiguousarray(Ms, np.float32).reshape(n, 6)
    if borders is None:
        borders = np.stack([s.reshape(-1, 3).mean(axis=0) for s in srcs]).astype(
            np.float32
        )
    borders = np.ascontiguousarray(borders, np.float32)
    mean = np.ascontiguousarray(mean, np.float32).reshape(3)
    std = np.ascontiguousarray(std, np.float32).reshape(3)
    dst = np.empty((n, oh, ow, 3), np.float32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * n)(*[s.ctypes.data_as(u8p) for s in srcs])
    shs = np.array([s.shape[0] for s in srcs], np.int32)
    sws = np.array([s.shape[1] for s in srcs], np.int32)
    lib.rtm3d_warp_normalize_batch(
        ptrs,
        shs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _fptr(Ms), _fptr(borders), _fptr(dst), n, oh, ow, _fptr(mean), _fptr(std),
    )
    return dst


def splat_heatmap(hm: np.ndarray, centers, cls, sigma, radius, noise, mask) -> np.ndarray:
    """Native CPU Gaussian max-splat into (C, H, W) float32 (in place)."""
    lib = load_library()
    assert lib is not None, "native library not built (make -C native)"
    hm = np.ascontiguousarray(hm, np.float32)
    centers = np.ascontiguousarray(centers, np.int32)
    cls = np.ascontiguousarray(cls, np.int32)
    sigma = np.ascontiguousarray(sigma, np.float32)
    radius = np.ascontiguousarray(radius, np.float32)
    noise = np.ascontiguousarray(noise, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    C, H, W = hm.shape
    lib.rtm3d_splat_heatmap(
        _fptr(hm), C, H, W,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _fptr(sigma), _fptr(radius),
        noise.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(cls),
    )
    return hm
