"""ctypes bindings for the native IO library (native/diffcodec_io.cc).

Builds on demand (g++, no external deps) and falls back to the pure-Python
implementations when a toolchain is unavailable.  All formats are
bit-identical with the Python paths (verified in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdiffcodec_io.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.flo_read.restype = ctypes.c_int
    lib.flo_write.restype = ctypes.c_int
    lib.flo_read_pooled.restype = ctypes.c_int
    lib.sfl_encode.restype = ctypes.c_int64
    lib.sfl_peek.restype = ctypes.c_int
    lib.sfl_decode.restype = ctypes.c_int32
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_flo(path: str) -> np.ndarray:
    """Native .flo reader; same output as utils.flo_io.read_flo."""
    lib = get_lib()
    if lib is None:
        from diffcodec_tpu.utils.flo_io import read_flo as py_read
        return py_read(path)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.flo_read(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"invalid .flo file {path!r} (rc={rc})")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.flo_read(path.encode(), _f32p(out), ctypes.byref(h),
                      ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"invalid .flo file {path!r} (rc={rc})")
    return out


def write_flo(path: str, flow: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        from diffcodec_tpu.utils.flo_io import write_flo as py_write
        return py_write(path, flow)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be [H, W, 2], got {flow.shape}")
    flow = np.ascontiguousarray(flow, np.float32)
    rc = lib.flo_write(path.encode(), _f32p(flow), flow.shape[0],
                       flow.shape[1])
    if rc != 0:
        raise IOError(f"failed to write {path!r} (rc={rc})")


def read_flo_pooled(path: str, target_h: int, target_w: int) -> np.ndarray:
    """Read + adaptive-avg-pool downsample in one native pass
    (dataset hot path)."""
    lib = get_lib()
    if lib is None:
        from diffcodec_tpu.train.dataset import load_flow_cached
        return load_flow_cached(path, target_h, target_w)
    out = np.empty((target_h, target_w, 2), np.float32)
    rc = lib.flo_read_pooled(path.encode(), _f32p(out), target_h, target_w)
    if rc != 0:
        raise ValueError(f"invalid .flo file {path!r} (rc={rc})")
    return out


def encode_sparse_flow(sparse: np.ndarray, mask: np.ndarray) -> bytes:
    """Native SFL1 encoder, bit-identical with codec.bits.encode_sparse_flow."""
    lib = get_lib()
    if lib is None:
        from diffcodec_tpu.codec.bits import encode_sparse_flow as py_enc
        return py_enc(sparse, mask)
    H, W = sparse.shape[:2]
    ys, xs = np.where(mask[:, :, 0] > 0)
    u = np.ascontiguousarray(sparse[ys, xs, 0], np.float32)
    v = np.ascontiguousarray(sparse[ys, xs, 1], np.float32)
    ys16 = np.ascontiguousarray(ys, np.uint16)
    xs16 = np.ascontiguousarray(xs, np.uint16)
    n = len(ys)
    size = lib.sfl_encode(_f32p(u), _f32p(v), None, None, n, H, W, None)
    buf = np.empty(size, np.uint8)
    lib.sfl_encode(
        _f32p(u), _f32p(v),
        ys16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        xs16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, H, W,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return buf.tobytes()


def decode_sparse_flow(data: bytes) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    if lib is None:
        from diffcodec_tpu.codec.bits import decode_sparse_flow as py_dec
        return py_dec(data)
    arr = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    count = ctypes.c_int32()
    rc = lib.sfl_peek(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      len(data), ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(count))
    if rc != 0:
        raise ValueError("bad sparse-flow bitstream")
    dense = np.zeros((h.value, w.value, 2), np.float32)
    mask2d = np.zeros((h.value, w.value), np.int32)
    lib.sfl_decode(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   len(data), _f32p(dense),
                   mask2d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    mask = np.repeat(mask2d[:, :, None], 2, axis=2)
    return dense, mask
