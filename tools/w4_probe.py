"""Incremental w4-kernel variant probe (prints each result as it lands).

Hypotheses for the 16.4 ms/step w4 stream (decode_profile.py):
  H1  nibble-decode VPU cost        -> compare w4_current vs bf16_pallas
  H2  chunked small-K dot structure -> compare bf16_pallas vs bf16_xla
  H3  M=64 half-filled MXU rows     -> every variant at M=64 and M=128
  H4  int8 MXU path (no bf16 decode)-> w8a8-style dot at 2x MXU rate
  H5  decode-to-block + one big dot -> w4_block variant

Run: python tools/w4_probe.py   (real chip, no platform override)
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
K, N, GS = 4096, 22016, 128
STEPS = 256


def timeit(fn, *args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[1] / STEPS * 1e3


def loop(body, *static):
    @jax.jit
    def run(x0, *a):
        def step(x, _):
            y = body(x, *a)
            return x0 * (1 + y.astype(F32).mean() * 1e-9
                         ).astype(x0.dtype), None
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return x
    return run


def report(name, fn, *args):
    try:
        ms = timeit(fn, *args)
        print(json.dumps({name: round(ms, 4)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({name: f'FAIL {type(e).__name__}: {str(e)[:120]}'}),
              flush=True)


def main():
    rng = np.random.RandomState(0)
    codes = jnp.asarray(rng.randint(-8, 8, size=(N, K)), jnp.int8)
    scales = jnp.asarray(rng.rand(N, K // GS) * 0.01 + 0.005, F32)
    meta = QMeta(bits=4, group_size=GS, symmetric=True,
                 out_features=N, in_features=K)
    packed, s, _ = pack_weight(codes, scales, None, meta)
    wb = jnp.asarray(rng.randn(N, K), jnp.bfloat16)
    wi8 = codes

    for M in (64, 128):
        x0 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        tag = f'm{M}'

        report(f'{tag}_w4_current',
               loop(lambda x, p, ss: dequant_matmul_pallas(
                   x, p, ss, None, meta)), x0, packed, s)

        report(f'{tag}_bf16_xla',
               loop(lambda x, w: jnp.dot(
                   x, w.T, preferred_element_type=F32).astype(x.dtype)),
               x0, wb)

        # bf16 pallas, same pair-chunked structure as w4_current
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
                xx0 = x[:, 2 * p * gs:(2 * p + 1) * gs]
                xx1 = x[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
                acc = acc + jax.lax.dot_general(
                    xx0, w0, (((1,), (1,)), ((), ())),
                    preferred_element_type=F32)
                acc = acc + jax.lax.dot_general(
                    xx1, w1, (((1,), (1,)), ((), ())),
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

        report(f'{tag}_bf16_pallas_chunked', loop(bf16_pallas), x0, wb)

        # bf16 pallas, ONE dot per k-step over a big span
        def _bf16_big(x_ref, w_ref, o_ref, acc_ref, *, n_k):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            acc_ref[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=F32)

            @pl.when(k == n_k - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        def bf16_big(x, w, tn=5504, span=1024):
            n_k = K // span
            kern = functools.partial(_bf16_big, n_k=n_k)
            return pl.pallas_call(
                kern, grid=(1, N // tn, n_k),
                in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                          pl.BlockSpec((tn, span), lambda i, j, k: (j, k))],
                out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((M, tn), F32)],
            )(x, w)

        report(f'{tag}_bf16_pallas_bigdot', loop(bf16_big), x0, wb)

        # int8 weights, decode to bf16 in-kernel + one big dot
        def _i8_big(x_ref, w_ref, o_ref, acc_ref, *, n_k):
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

        def i8_big(x, w, tn=5504, span=1024):
            n_k = K // span
            kern = functools.partial(_i8_big, n_k=n_k)
            return pl.pallas_call(
                kern, grid=(1, N // tn, n_k),
                in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                          pl.BlockSpec((tn, span), lambda i, j, k: (j, k))],
                out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((M, tn), F32)],
            )(x, wi8)

        report(f'{tag}_i8_cast_bigdot', loop(i8_big), x0, wi8)

        # int8 x int8 -> int32 MXU dot (w8a8 compute path)
        def _i8i8(x_ref, w_ref, o_ref, acc_ref, *, n_k):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            acc_ref[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(k == n_k - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        def i8i8(x, w, tn=5504, span=1024):
            n_k = K // span
            kern = functools.partial(_i8i8, n_k=n_k)
            xq = jnp.clip(jnp.round(x.astype(F32) * 16.0), -127,
                          127).astype(jnp.int8)
            y = pl.pallas_call(
                kern, grid=(1, N // tn, n_k),
                in_specs=[pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                          pl.BlockSpec((tn, span), lambda i, j, k: (j, k))],
                out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                scratch_shapes=[pltpu.VMEM((M, tn), jnp.int32)],
            )(xq, w)
            return (y.astype(F32) * (1 / 16.0)).astype(jnp.bfloat16)

        report(f'{tag}_i8xi8_int32dot', loop(i8i8), x0, wi8)

        # w4: decode whole block to bf16 with scale mult, one big dot
        # scales prepared [n_k, span//GS, tn] like the shipping kernel
        def _w4_block(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k,
                      spg, gs):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            u = w_ref[:].astype(jnp.int32)        # [tn, span//2] packed
            lo = (u & 0xF).astype(jnp.bfloat16)   # group 2g
            hi = (u >> 4).astype(jnp.bfloat16)    # group 2g+1
            xs = []
            for g in range(spg):
                sl = s_ref[0, 2 * g, :][:, None].astype(jnp.bfloat16)
                sh = s_ref[0, 2 * g + 1, :][:, None].astype(jnp.bfloat16)
                xs.append(lo[:, g * gs:(g + 1) * gs] * sl)
                xs.append(hi[:, g * gs:(g + 1) * gs] * sh)
            w = jnp.concatenate(xs, axis=1)       # [tn, span] bf16
            acc_ref[:] += jax.lax.dot_general(
                x_ref[:], w, (((1,), (1,)), ((), ())),
                preferred_element_type=F32)

            @pl.when(k == n_k - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        def w4_block(x, p, s2, tn=5504, spg=4):
            span = spg * 2 * GS
            n_k = K // span
            ng = K // GS
            # packed layout: byte col c of pair p holds groups (2p, 2p+1);
            # x must be permuted to match [lo..., hi...] per pair concat
            kern = functools.partial(_w4_block, n_k=n_k, spg=spg, gs=GS)
            s3 = s2.reshape(N, n_k, 2 * spg).transpose(1, 2, 0)
            y = pl.pallas_call(
                kern, grid=(1, N // tn, n_k),
                in_specs=[
                    pl.BlockSpec((M, span), lambda i, j, k: (i, k)),
                    pl.BlockSpec((tn, span // 2), lambda i, j, k: (j, k)),
                    pl.BlockSpec((1, 2 * spg, tn), lambda i, j, k: (k, 0, j)),
                ],
                out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), F32),
                scratch_shapes=[pltpu.VMEM((M, tn), F32)],
            )(x, p, s3)
            return y.astype(jnp.bfloat16)

        report(f'{tag}_w4_blockdecode_bigdot', loop(w4_block), x0,
               packed, s)

        # int4 NATIVE dtype ref (jnp.int4) + cast, one big dot
        try:
            wi4 = codes.astype(jnp.int4)

            def _i4_big(x_ref, w_ref, o_ref, acc_ref, *, n_k):
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

            def i4_big(x, w, tn=5504, span=1024):
                n_k = K // span
                kern = functools.partial(_i4_big, n_k=n_k)
                return pl.pallas_call(
                    kern, grid=(1, N // tn, n_k),
                    in_specs=[pl.BlockSpec((M, span),
                                           lambda i, j, k: (i, k)),
                              pl.BlockSpec((tn, span),
                                           lambda i, j, k: (j, k))],
                    out_specs=pl.BlockSpec((M, tn), lambda i, j, k: (i, j)),
                    out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                    scratch_shapes=[pltpu.VMEM((M, tn), F32)],
                )(x, w)

            report(f'{tag}_i4_native_bigdot', loop(i4_big), x0, wi4)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f'{tag}_i4_native_bigdot':
                              f'FAIL {str(e)[:120]}'}), flush=True)

        # int4 native via plain XLA (no pallas)
        try:
            wi4 = codes.astype(jnp.int4)
            report(f'{tag}_i4_native_xla',
                   loop(lambda x, w: jnp.dot(
                       x, w.astype(jnp.bfloat16).T,
                       preferred_element_type=F32).astype(x.dtype)),
                   x0, wi4)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f'{tag}_i4_native_xla':
                              f'FAIL {str(e)[:120]}'}), flush=True)


if __name__ == '__main__':
    main()
