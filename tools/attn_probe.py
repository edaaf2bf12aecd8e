"""Decode-attention path shootout on the real chip.

Times one full decode step's worth of attention (all L layers, one
pallas_call / XLA loop per layer) for each implementation x cache dtype
at serving shapes, so the dispatch policy in serve/decode.py is chosen
from measurements, not guesses (VERDICT r2 #2/#8).

  python tools/attn_probe.py                 # serving shapes
  python tools/attn_probe.py --long          # long-context shapes
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llmc_tpu.ops.flash_decode import flash_decode_attention
from llmc_tpu.serve.decode import _decode_attn_chunked, _chunk_for
from llmc_tpu.serve.kvcache import KVCachePolicy

F32 = jnp.float32


class _Cfg:
    def __init__(self, kvh):
        self.num_key_value_heads = kvh


def bench_case(L, B, S, KVH, H, hd, kv, impl, iters=20, n_exec=4):
    """Buffers are full [L, ...] (realistic HBM footprint) but only
    ``n_exec`` layer calls execute per step — remote compiles of a
    32-layer unrolled jit take minutes each; per-layer cost is what the
    dispatch policy needs.  Reported ms/GBps are per-executed-layer
    scaled to L layers."""
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, hd), F32) * 0.08
    pos = jnp.full((B,), S - 2, jnp.int32)
    if kv == 'int8':
        kbuf = jax.random.randint(key, (L, B, S, KVH, hd), -127, 128,
                                  jnp.int8)
        vbuf = jax.random.randint(key, (L, B, S, KVH, hd), -127, 128,
                                  jnp.int8)
        ks = jax.random.uniform(key, (L, B, S, KVH), F32, .01, .03)
        vs = jax.random.uniform(key, (L, B, S, KVH), F32, .01, .03)
        cache = {'k_q': kbuf, 'v_q': vbuf, 'k_s': ks, 'v_s': vs,
                 'pos': pos}
        policy = KVCachePolicy(method='naive', bit=8, symmetric=True)
        nbytes = 2 * L * B * S * KVH * hd * (1 + 4 / hd)
    else:
        kbuf = jax.random.normal(key, (L, B, S, KVH, hd),
                                 jnp.bfloat16)
        vbuf = jax.random.normal(key, (L, B, S, KVH, hd),
                                 jnp.bfloat16)
        ks = vs = None
        cache = {'k': kbuf, 'v': vbuf, 'pos': pos}
        policy = KVCachePolicy(method='fp')
        nbytes = 2 * L * B * S * KVH * hd * 2
    cfg = _Cfg(KVH)

    layers = list(range(0, L, max(1, L // n_exec)))[:n_exec]
    if impl == 'chunked':
        chunk = _chunk_for(S)
        if chunk is None:
            return None

        @jax.jit
        def step(q, cache, c):
            out = []
            for layer in layers:
                out.append(_decode_attn_chunked(
                    (q + c * 1e-30)[:, None], cache, layer, policy, cfg,
                    chunk))
            return jnp.stack(out).sum()
    else:
        if impl == 'batch':
            from llmc_tpu.ops.batch_decode import batch_decode_attention
            fn = batch_decode_attention
        else:
            fn = flash_decode_attention

        # buffers MUST come in via the cache argument: closing over the
        # device arrays embeds them as jit constants and the remote
        # compile payload becomes buffer-sized (GBs at L=32 -> hang)
        @jax.jit
        def step(q, cache, c):
            kb = cache['k'] if 'k' in cache else cache['k_q']
            vb = cache['v'] if 'v' in cache else cache['v_q']
            kss, vss = cache.get('k_s'), cache.get('v_s')
            out = []
            for layer in layers:
                out.append(fn(q + c * 1e-30, kb, vb, kss, vss,
                              cache['pos'],
                              jnp.asarray(layer, jnp.int32)))
            return jnp.stack(out).sum()

    # The axon tunnel memoizes same-arg executions and
    # block_until_ready doesn't hard-sync: thread the result back in as
    # a carry (device-resident, so no per-call host uploads), force ONE
    # value fetch, and amortize the ~35ms fixed fetch latency by
    # differencing two loop counts.
    def timed(n):
        c = jnp.float32(0)
        c = step(q, cache, c)
        float(c)  # settle compile + warm path
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(q, cache, c)
        float(c)
        return time.perf_counter() - t0

    try:
        n1, n2 = max(2, iters // 4), iters
        t1, t2 = timed(n1), timed(n2)
    except Exception as e:
        return ('FAIL', str(e)[:120])
    dt = (t2 - t1) / (n2 - n1) * (L / len(layers))
    # valid-prefix bytes actually needed (pos+1 tokens of S)
    frac = float(pos[0] + 1) / S
    return dt * 1e3, nbytes * frac / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--long', action='store_true')
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--case', default=None,
                    help='single "B,S" case (foreground-friendly)')
    ap.add_argument('--kv', default=None, choices=['fp', 'int8'])
    ap.add_argument('--impl', default=None,
                    choices=['chunked', 'flash', 'batch'])
    ap.add_argument('--grid', action='store_true',
                    help='B x S crossover grid for the dispatch table '
                         '(VERDICT r4 #7)')
    args = ap.parse_args()
    L, KVH, H, hd = 32, 32, 32, 128   # Llama-2-7B
    if args.case:
        cases = [tuple(int(x) for x in args.case.split(','))]
    elif args.grid:
        # dispatch-boundary grid: measure, don't interpolate.  L=8
        # executed-layer scaling as in --long (full-L buffers OOM at
        # B=128 x 16k).
        cases = [(B, S) for S in (1024, 4096, 16384)
                 for B in (1, 8, 16, 32, 64, 128)
                 if B * S <= 128 * 16384 // 8]
        L = 8
    elif args.long:
        cases = [(8, 4096), (4, 8192), (1, 16384), (16, 2048)]
        L = 8   # only n_exec layers run; full-L long buffers OOM 16GB
    else:
        cases = [(128, 96), (128, 128), (256, 96), (64, 96), (32, 128)]
    print(f'{"B":>4} {"S":>6} {"kv":>5} {"impl":>8} {"ms":>8} '
          f'{"GB/s(valid)":>12}')
    for B, S in cases:
        for kv in ((args.kv,) if args.kv else ('fp', 'int8')):
            for impl in ((args.impl,) if args.impl
                         else ('chunked', 'flash', 'batch')
                         if args.grid else ('chunked', 'flash')):
                r = bench_case(L, B, S, KVH, H, hd, kv, impl,
                               iters=args.iters)
                if r is None:
                    continue
                if r[0] == 'FAIL':
                    print(f'{B:>4} {S:>6} {kv:>5} {impl:>8}   FAIL '
                          f'{r[1]}')
                else:
                    print(f'{B:>4} {S:>6} {kv:>5} {impl:>8} '
                          f'{r[0]:>8.3f} {r[1]:>12.1f}')


if __name__ == '__main__':
    main()
