"""ctypes bindings for the native C++ repack kernels (csrc/repack.cpp).

The .so is built on demand (`make -C csrc`); everything degrades gracefully
to the vectorized-numpy implementations in qtensor.py when unavailable or
when BT_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BT_NO_NATIVE") == "1":
        return None
    so = os.path.join(_csrc_dir(), "libbooster_repack.so")
    if not os.path.exists(so):
        try:  # build on demand (fast: one TU)
            subprocess.run(
                ["make", "-C", _csrc_dir(), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64, i32 = ctypes.c_int64, ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bt_repack_q4_0.argtypes = [u8p, i64, i64, u8p, f32p, i32]
    lib.bt_repack_q8_0.argtypes = [u8p, i64, i64, i8p, f32p, i32]
    lib.bt_repack_q4_k.argtypes = [u8p, i64, i64, u8p, f32p, f32p, i32]
    lib.bt_repack_q6_k.argtypes = [u8p, i64, i64, i8p, f32p, i32]
    lib.bt_repack_q5_k.argtypes = [u8p, i64, i64, i8p, f32p, f32p, i32]
    _LIB = lib
    return _LIB


def _threads() -> int:
    return min(os.cpu_count() or 1, 16)


def repack_q4_0(raw: np.ndarray, out_f: int, in_f: int):
    lib = get_lib()
    if lib is None:
        return None
    qw = np.empty((out_f, in_f // 2), np.uint8)
    scales = np.empty((out_f, in_f // 32), np.float32)
    lib.bt_repack_q4_0(np.ascontiguousarray(raw), out_f, in_f, qw, scales, _threads())
    return qw, scales


def repack_q8_0(raw: np.ndarray, out_f: int, in_f: int):
    lib = get_lib()
    if lib is None:
        return None
    qw = np.empty((out_f, in_f), np.int8)
    scales = np.empty((out_f, in_f // 32), np.float32)
    lib.bt_repack_q8_0(np.ascontiguousarray(raw), out_f, in_f, qw, scales, _threads())
    return qw, scales


def repack_q4_k(raw: np.ndarray, out_f: int, in_f: int):
    lib = get_lib()
    if lib is None:
        return None
    qw = np.empty((out_f, in_f // 2), np.uint8)
    scales = np.empty((out_f, in_f // 32), np.float32)
    mins = np.empty((out_f, in_f // 32), np.float32)
    lib.bt_repack_q4_k(np.ascontiguousarray(raw), out_f, in_f, qw, scales, mins, _threads())
    return qw, scales, mins


def repack_q6_k(raw: np.ndarray, out_f: int, in_f: int):
    lib = get_lib()
    if lib is None:
        return None
    qw = np.empty((out_f, in_f), np.int8)
    scales = np.empty((out_f, in_f // 16), np.float32)
    lib.bt_repack_q6_k(np.ascontiguousarray(raw), out_f, in_f, qw, scales, _threads())
    return qw, scales


def repack_q5_k(raw: np.ndarray, out_f: int, in_f: int):
    lib = get_lib()
    if lib is None:
        return None
    qw = np.empty((out_f, in_f), np.int8)
    scales = np.empty((out_f, in_f // 32), np.float32)
    mins = np.empty((out_f, in_f // 32), np.float32)
    lib.bt_repack_q5_k(np.ascontiguousarray(raw), out_f, in_f, qw, scales, mins, _threads())
    return qw, scales, mins
