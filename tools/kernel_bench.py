"""Isolate the w4 dequant-matmul kernel's cost components on the TPU.

One linear: M=64, K=4096, N=22016 (gate_up-shaped), gs=128.  Variants:

  w4_current   - the shipping kernel (group-pair nibbles, i32 widen)
  bf16_pallas  - same grid/epilogue but weights already bf16: isolates
                 the nibble-decode cost (diff vs w4_current) and the
                 kernel-structure overhead (diff vs bf16_xla)
  bf16_xla     - plain jnp matmul baseline
  i8_cast      - int8 full-width weights, single cast + one dot per
                 k-step: the sub-word widen/cast cost alone
  i32_window   - shuffle-free decode probe: nibbles packed 8-per-i32
                 word over lane-strided columns; extraction is
                 lane-local shift/and/cast (numerics use one global
                 scale - speed probe only)

Run: python tools/kernel_bench.py   (real chip, no platform override)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmc_tpu.ops.dequant_matmul import (QMeta, dequant_matmul_pallas,
                                         pack_weight)

F32 = jnp.float32
M, K, N, GS = 64, 4096, 22016, 128
STEPS = 256


def timeit(fn, *args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[1] / STEPS * 1e3          # ms per call


def loop(body, *args):
    """scan STEPS times, feeding a perturbed x back in."""
    @jax.jit
    def run(x0, *a):
        def step(x, _):
            y = body(x, *a)
            return x0 * (1 + y.astype(F32).mean() * 1e-9
                         ).astype(x0.dtype), None
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return x
    return run


def main():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    codes = jnp.asarray(rng.randint(-8, 8, size=(N, K)), jnp.int8)
    scales = jnp.asarray(rng.rand(N, K // GS) * 0.01 + 0.005, F32)
    meta = QMeta(bits=4, group_size=GS, symmetric=True,
                 out_features=N, in_features=K)
    packed, s, z = pack_weight(codes, scales, None, meta)
    out = {}

    # 1. current kernel
    out['w4_current'] = timeit(
        loop(lambda x, p, ss: dequant_matmul_pallas(x, p, ss, None, meta)),
        x0, packed, s)

    # 2. same structure, bf16 weights (two half-group dots per pair)
    wb = jnp.asarray(rng.randn(N, K), jnp.bfloat16)

    def _bf16_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k, pairs, gs):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[:]
        acc = acc_ref[:]
        for p in range(pairs):
            w0 = w_ref[:, (2 * p) * gs:(2 * p + 1) * gs]
            w1 = w_ref[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
            x0_ = x[:, 2 * p * gs:(2 * p + 1) * gs]
            x1_ = x[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
            acc = acc + jax.lax.dot_general(
                x0_, w0, (((1,), (1,)), ((), ())),
                preferred_element_type=F32)
            acc = acc + jax.lax.dot_general(
                x1_, w1, (((1,), (1,)), ((), ())),
                preferred_element_type=F32)
        acc_ref[:] = acc

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def bf16_pallas(x, w, tn=5504, pairs=2):
        span = pairs * 2 * GS
        n_k = K // span
        kern = functools.partial(_bf16_kernel, n_k=n_k, pairs=pairs,
                                 gs=GS)
        return pl.pallas_call(
            kern, grid=(1, N // tn, n_k),
            in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tn, span), lambda i, j, k: (j, k))],
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, tn), F32)],
        )(x, w)

    out['bf16_pallas'] = timeit(loop(bf16_pallas), x0, wb)

    # 3. XLA bf16
    out['bf16_xla'] = timeit(
        loop(lambda x, w: jnp.dot(x, w.T,
                                  preferred_element_type=F32
                                  ).astype(x.dtype)), x0, wb)

    # 4. int8 full-width, single cast + dot
    wi8 = codes

    def _i8_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        w = w_ref[:].astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w, (((1,), (1,)), ((), ())),
            preferred_element_type=F32)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def i8_pallas(x, w, tn=5504, span=512):
        n_k = K // span
        kern = functools.partial(_i8_kernel, n_k=n_k)
        return pl.pallas_call(
            kern, grid=(1, N // tn, n_k),
            in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tn, span), lambda i, j, k: (j, k))],
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, tn), F32)],
        )(x, w)

    out['i8_cast'] = timeit(loop(i8_pallas), x0, wi8)

    # 5. i32-window shuffle-free decode (speed probe)
    w32 = jnp.asarray(
        rng.randint(0, 2 ** 31, size=(N, K // 8)), jnp.int32)

    def _i32_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k, sub):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[:]
        words = w_ref[:]
        acc = acc_ref[:]
        for j in range(8):
            wj = ((words >> (4 * j)) & 0xF).astype(jnp.bfloat16)
            xj = x[:, j * sub:(j + 1) * sub]
            acc = acc + jax.lax.dot_general(
                xj, wj, (((1,), (1,)), ((), ())),
                preferred_element_type=F32)
        acc_ref[:] = acc

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def i32_pallas(x, w, tn=5504, span=1024):
        n_k = K // span
        sub = span // 8
        kern = functools.partial(_i32_kernel, n_k=n_k, sub=sub)
        return pl.pallas_call(
            kern, grid=(1, N // tn, n_k),
            in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tn, span // 8),
                                   lambda i, j, k: (j, k))],
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, tn), F32)],
        )(x, w)

    out['i32_window'] = timeit(loop(i32_pallas), x0, w32)

    # 6. full dequant in VMEM (scales folded into weights), ONE dot per
    # k-step with a wide K: fewer, larger MXU dots, no scale epilogue
    def _fullq_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k,
                      groups, gs):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[:]
        ws = []
        for g in range(groups):
            u = w_ref[:, g * gs // 2:(g + 1) * gs // 2].astype(jnp.int32)
            sg = s_ref[0, g, :][:, None].astype(jnp.bfloat16)  # [TN,1]
            w0 = (u & 0xF).astype(jnp.bfloat16) * sg
            w1 = (u >> 4).astype(jnp.bfloat16) * sg
            ws += [w0, w1]
        w = jnp.concatenate(ws, axis=1)            # [TN, groups*gs]
        acc_ref[:] += jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=F32)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def fullq(x, p, ss, tn=5504, groups=4):
        # group-halves packing: within group g, byte col c holds
        # (col c | col c+gs/2): repack accordingly
        span = groups * gs_eff
        n_k = K // span
        kern = functools.partial(_fullq_kernel, n_k=n_k, groups=groups,
                                 gs=gs_eff)
        s3 = ss.reshape(n_k, groups, N)
        return pl.pallas_call(
            kern, grid=(1, N // tn, n_k),
            in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tn, span // 2),
                                   lambda i, j, k: (j, k)),
                      pl.BlockSpec((1, groups, tn),
                                   lambda i, j, k: (k, 0, j))],
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, tn), F32)],
        )(x, p, s3)

    gs_eff = GS
    # halves-of-group packing + x reorder equivalence: for a speed probe
    # reuse the existing packed bytes and pre-transposed scales
    s_t = s.reshape(N, K // GS).T.reshape(K // GS, N)
    out['w4_fullq_g4'] = timeit(
        loop(lambda x, p, ss: fullq(x, p, ss, tn=512, groups=4)), x0, packed,
        s_t)
    out['w4_fullq_g8'] = timeit(
        loop(lambda x, p, ss: fullq(x, p, ss, tn=512, groups=8)), x0, packed,
        s_t)

    # 7. byte-dot decode in bf16 lanes: x@w = xe@b + (xo-16*xe)@hi with
    # b cast straight from u8 and hi = floor(b/16) in bf16 arithmetic --
    # ~3 bf16 ops per BYTE, no int widen.  Speed probe: x halves stand in
    # for the even/combo activations; scale epilogue included.
    def _xc_kernel(xe_ref, xc_ref, w_ref, s_ref, o_ref, acc_ref, *,
                   n_k, groups, hgs):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        xe = xe_ref[:]
        xc = xc_ref[:]
        acc = acc_ref[:]
        for g in range(groups):
            b16 = w_ref[:, g * hgs:(g + 1) * hgs].astype(jnp.int32).astype(jnp.bfloat16)
            hh = jnp.floor(b16 * jnp.bfloat16(0.0625))
            sg = s_ref[0, g:g + 1, :].astype(F32)
            d0 = jax.lax.dot_general(
                xe[:, g * hgs:(g + 1) * hgs], b16,
                (((1,), (1,)), ((), ())), preferred_element_type=F32)
            d1 = jax.lax.dot_general(
                xc[:, g * hgs:(g + 1) * hgs], hh,
                (((1,), (1,)), ((), ())), preferred_element_type=F32)
            acc = acc + (d0 + d1) * sg
        acc_ref[:] = acc

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    def xc_pallas(xe, xc, w, ss, tn=5504, groups=4):
        hgs = GS // 2
        span_b = groups * hgs                  # bytes per k-step
        n_k = (K // 2) // span_b
        kern = functools.partial(_xc_kernel, n_k=n_k, groups=groups,
                                 hgs=hgs)
        s3 = ss.reshape(n_k, groups, N)
        return pl.pallas_call(
            kern, grid=(1, N // tn, n_k),
            in_specs=[pl.BlockSpec((M, span_b), lambda i, j, k: (i, k)),
                      pl.BlockSpec((M, span_b), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tn, span_b), lambda i, j, k: (j, k)),
                      pl.BlockSpec((1, groups, tn),
                                   lambda i, j, k: (k, 0, j))],
            out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, tn), F32)],
        )(xe, xc, w, s3)

    xe0 = x0[:, :K // 2]
    xc0 = x0[:, K // 2:]

    def xc_loop(groups):
        @jax.jit
        def run(xe, xc, w, ss):
            def step(a, _):
                xe_, xc_ = a
                y = xc_pallas(xe_, xc_, w, ss, groups=groups)
                pert = (1 + y.astype(F32).mean() * 1e-9).astype(
                    jnp.bfloat16)
                return (xe0 * pert, xc0 * pert), None
            a, _ = jax.lax.scan(step, (xe, xc), None, length=STEPS)
            return a[0]
        return run

    out['w4_xc_g4'] = timeit(xc_loop(4), xe0, xc0, packed, s_t)
    out['w4_xc_g8'] = timeit(xc_loop(8), xe0, xc0, packed, s_t)

    bytes_w4 = N * K / 2
    out['xc_gbs'] = bytes_w4 / (out['w4_xc_g8'] / 1e3) / 1e9
    out['w4_gbs'] = bytes_w4 / (out['w4_current'] / 1e3) / 1e9
    out['i32_gbs'] = bytes_w4 / (out['i32_window'] / 1e3) / 1e9
    out['fullq_gbs'] = bytes_w4 / (out['w4_fullq_g8'] / 1e3) / 1e9
    out['bf16_gbs'] = (N * K * 2) / (out['bf16_xla'] / 1e3) / 1e9
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == '__main__':
    main()
