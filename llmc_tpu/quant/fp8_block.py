"""Per-128-block FP8 weight cast (DeepSeek-R1-style checkpoints).

Reference: the Triton kernels weight_cast_to_fp8 / weight_cast_to_bf16
(/root/reference/llmc/compression/quantization/kernel.py:56-138) and the
torch fallback (quant.py:18-43): weights are stored as float8_e4m3 codes
plus a per-[block_size x block_size] inverse scale.

Pure JAX: XLA fuses the reshape/scale/cast; on TPU fp8 is a native dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .fp_formats import float_cast

F32 = jnp.float32
E4M3_MAX = 448.0


def _block_view(w: jax.Array, bs: int):
    m, n = w.shape
    mp, np_ = -(-m // bs) * bs, -(-n // bs) * bs
    wp = jnp.pad(w, ((0, mp - m), (0, np_ - n)))
    return wp.reshape(mp // bs, bs, np_ // bs, bs), (m, n)


def weight_cast_to_fp8(w: jax.Array, block_size: int = 128
                       ) -> Tuple[jax.Array, jax.Array]:
    """bf16/f32 weight -> (fp8 codes, scale_inv [ceil(m/bs), ceil(n/bs)])
    (kernel.py:92-138 / quant.py:33-43)."""
    wb, (m, n) = _block_view(w.astype(F32), block_size)
    amax = jnp.clip(jnp.max(jnp.abs(wb), axis=(1, 3), keepdims=True),
                    1e-12, None)
    scale = E4M3_MAX / amax
    codes = float_cast(wb * scale, 4, 3, E4M3_MAX)
    codes = codes.reshape(wb.shape[0] * block_size, -1)[:m, :n]
    return codes.astype(jnp.float8_e4m3fn), (1.0 / scale)[:, 0, :, 0]


def weight_cast_to_bf16(codes: jax.Array, scale_inv: jax.Array,
                        block_size: int = 128,
                        dtype=jnp.bfloat16) -> jax.Array:
    """(fp8 codes, scale_inv) -> dense weight (kernel.py:56-90 /
    quant.py:18-30)."""
    m, n = codes.shape
    cb, _ = _block_view(codes.astype(F32), block_size)
    s = scale_inv[:, None, :, None].astype(F32)
    w = (cb * s).reshape(cb.shape[0] * block_size, -1)[:m, :n]
    return w.astype(dtype)


def act_quant_per_group(x: jax.Array, group: int = 128
                        ) -> Tuple[jax.Array, jax.Array]:
    """Per-128-group activation -> fp8 codes + scales (the Triton
    act_quant_kernel, kernel.py:7-54)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    xg = x.astype(F32).reshape(-1, n // group, group)
    amax = jnp.clip(jnp.max(jnp.abs(xg), axis=-1, keepdims=True),
                    1e-12, None)
    scale = amax / E4M3_MAX
    codes = float_cast(xg / scale, 4, 3, E4M3_MAX)
    return (codes.reshape(*lead, n).astype(jnp.float8_e4m3fn),
            scale.reshape(*lead, n // group))


def fp8_block_matmul(x_codes, x_scales, w_codes, w_scale_inv,
                     block_size: int = 128, out_dtype=jnp.bfloat16,
                     force_xla: bool = False):
    """Blockwise-scaled FP8 GEMM (fp8_gemm_kernel, kernel.py:141-242):
    y = (x_codes·x_scales) @ (w_codes·w_scale_inv)^T computed with fp8
    inputs feeding the MXU and f32 accumulation.  On TPU a Pallas kernel
    (ops/fp8_gemm.py) applies both scale factors to the [TM, TN]
    partials on the output side; elsewhere XLA fuses the epilogue.
    x: [M, K] codes + [M, K/bs] scales; w: [N, K] codes +
    [N/bs, K/bs] scale_inv."""
    M, K = x_codes.shape
    dev0 = jax.devices()[0]
    on_tpu = dev0.platform in ('tpu', 'axon') or 'tpu' in str(
        getattr(dev0, 'device_kind', '')).lower()
    if (not force_xla and on_tpu and K % block_size == 0
            and w_codes.shape[0] % 128 == 0):
        from ..ops.fp8_gemm import fp8_block_matmul_pallas
        return fp8_block_matmul_pallas(x_codes, x_scales, w_codes,
                                       w_scale_inv,
                                       block_size=block_size,
                                       out_dtype=out_dtype)
    N = w_codes.shape[0]
    kb = K // block_size
    xg = x_codes.reshape(M, kb, block_size)
    wg = w_codes.reshape(N, kb, block_size)
    # per k-block partial products, scaled and accumulated in f32
    part = jnp.einsum('mkb,nkb->mnk', xg.astype(jnp.bfloat16),
                      wg.astype(jnp.bfloat16),
                      preferred_element_type=F32)
    ws = jnp.repeat(w_scale_inv, block_size, axis=0)[:N]  # [N, kb]
    y = jnp.einsum('mnk,mk,nk->mn', part, x_scales.astype(F32),
                   ws.astype(F32))
    return y.astype(out_dtype)
