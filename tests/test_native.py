"""Native C++ packing library parity vs numpy references."""

import numpy as np
import pytest

import llmc_tpu.native as nat


def test_native_builds_and_loads():
    assert nat.available(), 'g++ build of libllmc_native.so failed'


def test_colsplit_roundtrip():
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 16, (64, 256)).astype(np.uint8)
    p = nat.pack_int4_colsplit(codes, 128)
    assert p.shape == (64, 128) and p.dtype == np.int8
    np.testing.assert_array_equal(nat.unpack_int4_colsplit(p, 128), codes)


def test_int32_pack_matches_numpy():
    from llmc_tpu.export import formats
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 16, (32, 96)).astype(np.uint8)
    pf = formats.pack_int32_rows.__wrapped__ if hasattr(
        formats.pack_int32_rows, '__wrapped__') else None
    got = nat.pack_int32_rows(codes, 4)
    # manual unpack check
    u = got.view(np.uint32)
    rec = np.zeros_like(codes)
    for i in range(8):
        rec[:, i::8] = ((u >> (4 * i)) & 0xF).astype(np.uint8)
    np.testing.assert_array_equal(rec, codes)


def test_bf16_rne_matches_mldtypes():
    import ml_dtypes
    x = np.random.RandomState(2).randn(4096).astype(np.float32)
    bits = nat.f32_to_bf16_bits(x)
    ref = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    np.testing.assert_array_equal(bits, ref)
    back = nat.bf16_to_f32(bits)
    ref_back = bits.view(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(back, ref_back)
