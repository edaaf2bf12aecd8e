"""ctypes bindings for the native packing/conversion library.

Auto-builds ``libllmc_native.so`` with make on first import (g++ is in
the image); every entry point has a numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libllmc_native.so')
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, u8p, i8p, i32p, u16p, f32p = (
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float))
    lib.pack_int4_colsplit.argtypes = [u8p, i8p, i64, i64, i64]
    lib.unpack_int4_colsplit.argtypes = [i8p, u8p, i64, i64, i64]
    lib.pack_int32_rows.argtypes = [u8p, i32p, i64, i64, i64]
    lib.pack_awq_order.argtypes = [u8p, i32p, i64, i64, i64]
    lib.bf16_to_f32.argtypes = [u16p, f32p, i64]
    lib.f32_to_bf16.argtypes = [f32p, u16p, i64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_int4_colsplit(codes: np.ndarray, gs: int) -> np.ndarray:
    """uint8 codes [N, K] -> int8 packed [N, K/2] (group-colsplit)."""
    codes = np.ascontiguousarray(codes, np.uint8)
    N, K = codes.shape
    lib = _load()
    if lib is None:
        span = K if K == gs else 2 * gs
        u = codes.reshape(N, K // span, span)
        lo, hi = u[..., :span // 2], u[..., span // 2:]
        return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8) \
            .reshape(N, K // 2)
    out = np.empty((N, K // 2), np.int8)
    lib.pack_int4_colsplit(_ptr(codes, ctypes.c_uint8),
                           _ptr(out, ctypes.c_int8), N, K, gs)
    return out


def unpack_int4_colsplit(packed: np.ndarray, gs: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.int8)
    N, half = packed.shape
    K = half * 2
    lib = _load()
    if lib is None:
        span = K if K == gs else 2 * gs
        u = packed.view(np.uint8).reshape(N, K // span, span // 2)
        out = np.empty((N, K // span, span), np.uint8)
        out[..., :span // 2] = u & 0xF
        out[..., span // 2:] = u >> 4
        return out.reshape(N, K)
    out = np.empty((N, K), np.uint8)
    lib.unpack_int4_colsplit(_ptr(packed, ctypes.c_int8),
                             _ptr(out, ctypes.c_uint8), N, K, gs)
    return out


def pack_int32_rows(codes: np.ndarray, bits: int) -> np.ndarray:
    """Unsigned codes [N, K] -> int32 [N, ceil(K/pf)] shift-pack."""
    codes = np.ascontiguousarray(codes, np.uint8)
    N, K = codes.shape
    pf = 32 // bits
    Kp = -(-K // pf)
    lib = _load()
    if lib is None:
        from ..export.formats import pack_int32_rows as np_pack
        return np_pack(codes, bits)
    out = np.empty((N, Kp), np.int32)
    lib.pack_int32_rows(_ptr(codes, ctypes.c_uint8),
                        _ptr(out, ctypes.c_int32), N, K, bits)
    return out


def pack_awq_order(m: np.ndarray, bits: int) -> np.ndarray:
    m = np.ascontiguousarray(m, np.uint8)
    R, C = m.shape
    pf = 32 // bits
    lib = _load()
    if lib is None:
        from ..export.formats import AWQ_ORDER
        order = AWQ_ORDER[:pf]
        g = m.reshape(R, C // pf, pf)[:, :, order].astype(np.uint32)
        packed = np.zeros((R, C // pf), np.uint32)
        for i in range(pf):
            packed |= g[:, :, i] << (bits * i)
        return packed.view(np.int32)
    out = np.empty((R, C // pf), np.int32)
    lib.pack_awq_order(_ptr(m, ctypes.c_uint8), _ptr(out, ctypes.c_int32),
                       R, C, bits)
    return out


def bf16_to_f32(a: np.ndarray) -> np.ndarray:
    """bf16 array (any bf16 dtype viewed as uint16) -> float32."""
    u16 = np.ascontiguousarray(a).view(np.uint16)
    lib = _load()
    if lib is None:
        return (u16.astype(np.uint32) << 16).view(np.float32).copy()
    out = np.empty(u16.shape, np.float32)
    lib.bf16_to_f32(_ptr(u16, ctypes.c_uint16),
                    _ptr(out, ctypes.c_float), u16.size)
    return out


def f32_to_bf16_bits(a: np.ndarray) -> np.ndarray:
    """float32 -> bf16 bit pattern (uint16), RNE."""
    a = np.ascontiguousarray(a, np.float32)
    lib = _load()
    if lib is None:
        bits = a.view(np.uint32)
        lsb = (bits >> 16) & 1
        return ((bits + 0x7FFF + lsb) >> 16).astype(np.uint16)
    out = np.empty(a.shape, np.uint16)
    lib.f32_to_bf16(_ptr(a, ctypes.c_float),
                    _ptr(out, ctypes.c_uint16), a.size)
    return out
