"""Pallas TPU kernel for the blockwise-scaled FP8 GEMM.

Reference counterpart: the Triton fp8_gemm
(/root/reference/llmc/compression/quantization/kernel.py:141-242):
y = (x_fp8 · x_scales) @ (w_fp8 · w_scale_inv)^T with per-[M,128]
activation scales and per-[128,128] weight scales.

TPU mapping: one k-step per 128-wide scale block; fp8 codes are cast to
bf16 in VMEM and fed to the MXU; both scale factors multiply the
[TM, TN] f32 partial on the output side (same structure as the int4
dequant-matmul kernel), so the per-element work is a single cast.
The weight scale grid is pre-expanded to [kb, N] outside the kernel
(kb·N f32 ≈ 0.5 MB for a 7B matrix) to keep the kernel's scale block a
plain [1, TN] row."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _kernel_fp8(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *,
                n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:].astype(jnp.bfloat16)
    wb = w_ref[:].astype(jnp.bfloat16)
    part = jax.lax.dot_general(xb, wb, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)
    # xs block [1, TM, 1], ws block [1, 1, TN] (3D to satisfy Mosaic's
    # trailing-dim divisibility rules)
    acc_ref[:] += part * xs_ref[0].astype(F32) * ws_ref[0].astype(F32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_size', 'tm', 'tn',
                                             'interpret', 'out_dtype'))
def fp8_block_matmul_pallas(x_codes, x_scales, w_codes, w_scale_inv,
                            block_size: int = 128, tm: int = 256,
                            tn: int = 512, out_dtype=jnp.bfloat16,
                            interpret: bool = False):
    """x: [M, K] fp8 codes + [M, K/bs] scales; w: [N, K] fp8 codes +
    [ceil(N/bs), K/bs] scale_inv.  Returns [M, N] out_dtype."""
    M, K = x_codes.shape
    N = w_codes.shape[0]
    bs = block_size
    kb = K // bs
    tm = min(tm, -(-M // 16) * 16)
    tn = min(tn, N)
    while N % tn:
        tn //= 2
    Mp = -(-M // tm) * tm
    if Mp != M:
        x_codes = jnp.pad(x_codes, ((0, Mp - M), (0, 0)))
        x_scales = jnp.pad(x_scales, ((0, Mp - M), (0, 0)))
    # expand weight scales to one row per output channel: [kb, 1, N]
    ws = jnp.repeat(w_scale_inv, bs, axis=0)[:N].T.astype(F32)[:, None, :]
    xs = x_scales.astype(F32).T[:, :, None]            # [kb, Mp, 1]
    grid = (Mp // tm, N // tn, kb)
    out = pl.pallas_call(
        functools.partial(_kernel_fp8, n_k=kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, bs), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, bs), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, tm, 1), lambda i, j, k: (k, i, 0)),
            pl.BlockSpec((1, 1, tn), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), F32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K + N * K + Mp * N * 2,
            transcendentals=0),
    )(x_codes, w_codes, xs, ws)
    return out[:M]
