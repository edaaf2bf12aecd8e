"""Prefill-shape (large-M) probe of the w4 dequant-matmul (VERDICT r3
item 3): nobody had measured the w4 kernel at M=4096 tiles — the bench
TTFT (B=128 x 32 tokens => M=4096 rows into every linear) was attributed
to the chip's large-matmul wall from a DENSE-bf16 measurement only.

Per (M, shape) this prints ms/op and effective TFLOP/s for:
  w4_pallas     - the shipped Pallas dequant-matmul (decode-tuned tiles)
  w4_xla        - dequantize-to-bf16 then one dense dot (weight decode
                  amortizes over M rows; candidate prefill path)
  bf16_dense    - plain XLA dot on a resident bf16 weight (chip ceiling
                  for the shape; no dequant at all)
plus the full bench prefill (forward_cached, last_only) for attribution.

Run on the real chip: python tools/prefill_probe.py
Env: PROBE_MS (comma list of M), PROBE_STEPS (loop length, default 32).
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

from llmc_tpu.ops.dequant_matmul import (QMeta, dequant_matmul,
                                         dequant_matmul_pallas,
                                         pack_weight)
from llmc_tpu.quant import QuantSpec

F32 = jnp.float32
STEPS = int(os.environ.get('PROBE_STEPS', '32'))


def loop(body):
    @jax.jit
    def run(x0, *a):
        def step(x, _):
            y = body(x, *a)
            return x0 * (1 + y.astype(F32).mean() * 1e-9
                         ).astype(x0.dtype), None
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return x
    return run


def timeit(fn, *args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[1] / STEPS * 1e3


def report(name, ms, flops):
    print(json.dumps({name: round(ms, 3),
                      'tflops': round(flops / (ms / 1e3) / 1e12, 1)}),
          flush=True)


def main():
    rng = np.random.RandomState(0)
    GS = 128
    SHAPES = {'gu': (4096, 22016), 'qkv': (4096, 12288)}
    ms_list = [int(m) for m in os.environ.get(
        'PROBE_MS', '128,512,1024,4096').split(',')]
    for sname, (K, N) in SHAPES.items():
        codes = jnp.asarray(rng.randint(-8, 8, size=(N, K)), jnp.int8)
        scales = jnp.asarray(rng.rand(N, K // GS) * 0.01 + 0.005, F32)
        meta = QMeta(bits=4, group_size=GS, symmetric=True,
                     out_features=N, in_features=K)
        packed, s, _ = pack_weight(codes, scales, None, meta)
        wb = jnp.asarray(rng.randn(N, K), jnp.bfloat16)
        for M in ms_list:
            x0 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
            flops = 2.0 * M * K * N
            tag = f'{sname}_m{M}'
            ms = timeit(loop(lambda x, p, ss: dequant_matmul_pallas(
                x, p, ss, None, meta)), x0, packed, s)
            report(f'{tag}_w4_pallas', ms, flops)
            ms = timeit(loop(lambda x, p, ss: dequant_matmul(
                x, p, ss, None, meta, force_xla=True)), x0, packed, s)
            report(f'{tag}_w4_xla', ms, flops)
            ms = timeit(loop(lambda x, w: jnp.dot(
                x, w.T, preferred_element_type=F32).astype(x.dtype)),
                x0, wb)
            report(f'{tag}_bf16_dense', ms, flops)

    # full bench prefill for attribution (B=128 x 32 => M=4096)
    from llmc_tpu.models import LlamaConfig
    from llmc_tpu.serve.decode import forward_cached
    from llmc_tpu.serve.kvcache import KVCachePolicy
    from llmc_tpu.serve.packed import random_packed_llama
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      head_dim=128, dtype='bfloat16')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=GS)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True, head=True)
    policy = KVCachePolicy(method='naive', bit=8)
    params = model.params
    B, P = 128, 32

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(params, ids, cache):
        logits, cache = forward_cached(params, cfg, ids, cache, policy,
                                       qmap, last_only=True, unroll=True)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    ids_rounds = jnp.asarray(rng.randint(
        0, cfg.vocab_size, size=(8, B, P)), jnp.int32)
    rix = iter(range(8))

    def one_timed():
        cache = policy.init_cache(B, P + 64, cfg.num_key_value_heads,
                                  cfg.head_dim, cfg.num_hidden_layers,
                                  dtype=cfg.jdtype)
        jax.block_until_ready(cache['pos'])
        pid = ids_rounds[next(rix)]
        np.asarray(pid[0, 0])
        t0 = time.time()
        tok, cache = prefill(params, pid, cache)
        np.asarray(tok)
        return time.time() - t0

    one_timed()   # compile
    ts = sorted(one_timed() for _ in range(5))
    ttft = ts[len(ts) // 2]
    # FLOP attribution at the measured per-shape rates
    lin_flops = 2.0 * B * P * (4096 * 12288 + 4096 * 4096
                               + 4096 * 22016 + 11008 * 4096) * 32
    head_flops = 2.0 * B * 4096 * 32000   # last_only: one row per slot
    print(json.dumps({'bench_prefill_ms': round(ttft * 1e3, 1),
                      'linear_tflops_at_that_time':
                          round(lin_flops / ttft / 1e12, 1),
                      'head_flops_share':
                          round(head_flops / lin_flops, 4)}), flush=True)


def prefill_ab():
    """A/B the FULL bench prefill: shipped Pallas w4 vs XLA
    dequant-to-bf16 + dense dot for every linear (run via
    `python tools/prefill_probe.py ab`)."""
    import llmc_tpu.ops.dequant_matmul as DQ
    from llmc_tpu.models import LlamaConfig
    from llmc_tpu.serve.decode import forward_cached
    from llmc_tpu.serve.kvcache import KVCachePolicy
    from llmc_tpu.serve.packed import random_packed_llama
    rng = np.random.RandomState(0)
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      head_dim=128, dtype='bfloat16')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True, head=True)
    policy = KVCachePolicy(method='naive', bit=8)
    params = model.params
    B, P = 128, 32
    ids_rounds = jnp.asarray(rng.randint(
        0, cfg.vocab_size, size=(16, B, P)), jnp.int32)
    rix = iter(range(16))

    orig = DQ.dequant_matmul

    def make_prefill():
        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill(params, ids, cache):
            logits, cache = forward_cached(params, cfg, ids, cache,
                                           policy, qmap, last_only=True,
                                           unroll=True)
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                    cache)
        return prefill

    def ttft(prefill):
        def one():
            cache = policy.init_cache(B, P + 64, cfg.num_key_value_heads,
                                      cfg.head_dim,
                                      cfg.num_hidden_layers,
                                      dtype=cfg.jdtype)
            jax.block_until_ready(cache['pos'])
            pid = ids_rounds[next(rix)]
            np.asarray(pid[0, 0])
            t0 = time.time()
            tok, cache = prefill(params, pid, cache)
            np.asarray(tok)
            return time.time() - t0
        one()
        return sorted(one() for _ in range(5))[2]

    t_pallas = ttft(make_prefill())

    def forced(x, packed, scales, zeros, meta, force_xla=False,
               out_dtype=None):
        return orig(x, packed, scales, zeros, meta, force_xla=True,
                    out_dtype=out_dtype)

    DQ.dequant_matmul = forced
    try:
        t_xla = ttft(make_prefill())
    finally:
        DQ.dequant_matmul = orig
    lin_flops = 2.0 * B * P * 6.46e9
    print(json.dumps({
        'prefill_pallas_ms': round(t_pallas * 1e3, 1),
        'prefill_xla_dequant_ms': round(t_xla * 1e3, 1),
        'pallas_tflops': round(lin_flops / t_pallas / 1e12, 1),
        'xla_tflops': round(lin_flops / t_xla / 1e12, 1)}), flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'ab':
        prefill_ab()
    else:
        main()
