"""FP8 per-block cast + blockwise GEMM tests (DeepSeek ingestion path)."""

import numpy as np

import jax.numpy as jnp

from llmc_tpu.quant import (act_quant_per_group, fp8_block_matmul,
                            weight_cast_to_bf16, weight_cast_to_fp8)


def test_fp8_roundtrip_small_error():
    rng = np.random.RandomState(0)
    w = (rng.randn(64, 96) * 0.05).astype(np.float32)
    codes, sinv = weight_cast_to_fp8(jnp.asarray(w), block_size=32)
    assert codes.dtype == jnp.float8_e4m3fn
    assert sinv.shape == (2, 3)
    back = np.asarray(weight_cast_to_bf16(codes, sinv, 32,
                                          dtype=jnp.float32))
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.07  # e4m3 has ~2 decimal digits


def test_fp8_matches_torch_cast_blockwise():
    import torch
    rng = np.random.RandomState(1)
    w = (rng.randn(32, 32)).astype(np.float32)
    codes, sinv = weight_cast_to_fp8(jnp.asarray(w), block_size=32)
    # scale chosen as absmax/448 per block; torch cast of scaled values
    scale = 448.0 / np.abs(w).max()
    ref = (torch.tensor(w * scale).to(torch.float8_e4m3fn)
           .float().numpy())
    np.testing.assert_array_equal(np.asarray(codes.astype(jnp.float32)),
                                  ref)


def test_act_quant_per_group():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 256).astype(np.float32)
    codes, scales = act_quant_per_group(jnp.asarray(x), group=128)
    assert codes.shape == (4, 256) and scales.shape == (4, 2)
    back = np.asarray(codes.astype(jnp.float32)) * np.repeat(
        np.asarray(scales), 128, axis=1)
    assert np.abs(back - x).max() / np.abs(x).max() < 0.07


def test_fp8_block_matmul_close():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 256).astype(np.float32)
    w = (rng.randn(64, 256) * 0.05).astype(np.float32)
    xq, xs = act_quant_per_group(jnp.asarray(x), 128)
    wq, ws = weight_cast_to_fp8(jnp.asarray(w), 128)
    y = np.asarray(fp8_block_matmul(xq, xs, wq, ws, 128,
                                    out_dtype=jnp.float32))
    ref = x @ w.T
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.1


def test_fp8_pallas_kernel_matches_xla():
    """Pallas blockwise FP8 GEMM (ops/fp8_gemm.py, interpret mode) vs
    the XLA reference path."""
    import jax.numpy as jnp
    from llmc_tpu.quant.fp8_block import (act_quant_per_group,
                                          fp8_block_matmul,
                                          weight_cast_to_fp8)
    from llmc_tpu.ops.fp8_gemm import fp8_block_matmul_pallas
    rng = np.random.RandomState(0)
    M, K, N = 8, 256, 128
    x = rng.randn(M, K).astype(np.float32) * 0.3
    w = rng.randn(N, K).astype(np.float32) * 0.05
    xc, xs = act_quant_per_group(jnp.asarray(x), 128)
    wc, ws = weight_cast_to_fp8(jnp.asarray(w), 128)
    ref = np.asarray(fp8_block_matmul(xc, xs, wc, ws, force_xla=True)
                     ).astype(np.float32)
    got = np.asarray(fp8_block_matmul_pallas(
        xc, xs, wc, ws, tm=16, tn=128, interpret=True)
        ).astype(np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03
    # and against the true fp32 product (fp8 quant noise only)
    true = x @ w.T
    rel2 = np.abs(got - true).max() / (np.abs(true).max() + 1e-9)
    assert rel2 < 0.1
