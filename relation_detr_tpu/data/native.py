"""ctypes bindings + JIT build for the native data plane.

Mirrors the reference's JIT-compiled native op pattern
(/root/reference/models/bricks/ms_deform_attn.py:17-24): compiled with g++ on
first import, cached next to the source, graceful fallback when the toolchain
or libjpeg is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger("relation_detr_tpu")

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO_PATH = os.path.join(_CSRC, "libdataplane.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_CSRC, "dataplane.cpp")
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return True
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
        "-ljpeg", "-lpthread", "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        stderr = getattr(e, "stderr", b"")
        logger.warning(f"native dataplane build failed: {e} {stderr[:500]}")
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.rdetr_decode_batch.restype = ctypes.c_int
    lib.rdetr_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        np.ctypeslib.ndpointer(np.int64),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int,
    ]
    lib.rdetr_decode_one.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def decode_batch_to_canvas(
    jpeg_blobs: List[bytes],
    canvas_hw: Tuple[int, int],
    min_size: int = 800,
    max_size: int = 1333,
    threads: int = 8,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode+resize+normalize a batch of JPEGs into a zeroed canvas batch.

    Returns (canvases (B, H, W, 3) float32, image_sizes (B, 2) int32,
    num_failures).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dataplane unavailable")
    bs = len(jpeg_blobs)
    ch, cw = canvas_hw
    canvases = np.zeros((bs, ch, cw, 3), np.float32)
    sizes = np.zeros((bs, 2), np.int32)
    lens = np.asarray([len(b) for b in jpeg_blobs], np.int64)
    ptrs = (ctypes.c_char_p * bs)(*jpeg_blobs)
    failures = lib.rdetr_decode_batch(
        ptrs, lens, bs, canvases, ch, cw, min_size, max_size,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        sizes, threads,
    )
    return canvases, sizes, int(failures)
