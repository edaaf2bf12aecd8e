"""Component-isolation profile of one 7B W4A16 decode step on the TPU.

Times, per decode step at the bench configuration (B=64, fp KV):
  full         - the bench's exact decode scan (reference point)
  tiny_cache   - same program with an (almost) empty KV cache: the step
                 minus KV-cache reads => isolates attention-read cost
  w4_stream    - scan over ONLY the stacked packed linears (the Pallas
                 w4 kernel stream): achieved weight-stream efficiency
  bf16_stream  - same matmul shapes in plain bf16: the chip's best case
  lm_head      - the head matmul alone
  b128         - full step at B=128 (MXU tile utilisation check)

Run on the real chip (no JAX_PLATFORMS override):
    python tools/decode_profile.py
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

from llmc_tpu.models import LlamaConfig
from llmc_tpu.ops.dequant_matmul import dequant_matmul
from llmc_tpu.quant import QuantSpec
from llmc_tpu.serve.decode import (forward_cached, init_cache,
                                   stack_block_params)
from llmc_tpu.serve.kvcache import KVCachePolicy
from llmc_tpu.serve.packed import random_packed_llama


def cfg7b():
    return LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=32,
                       head_dim=128, dtype='bfloat16')


def med(ts):
    return sorted(ts)[len(ts) // 2]


def time_fn(fn, *args, reps=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])      # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return med(ts)


def decode_loop(cfg, policy, qmap, params, stacked, B, prefill, steps,
                max_len):
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, size=(B, prefill)), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def prefill_fn(params, stacked, ids, cache):
        logits, cache = forward_cached(params, cfg, ids, cache, policy,
                                       qmap, stacked_blocks=stacked)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @functools.partial(jax.jit, donate_argnums=(3,))
    def decode_n(params, stacked, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = forward_cached(params, cfg, tok[:, None],
                                           cache, policy, qmap,
                                           stacked_blocks=stacked)
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                    cache), None
        (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                       length=steps)
        return tok, cache

    class Model:
        pass
    m = Model()
    m.cfg = cfg
    m.params = {'blocks': []}

    def one():
        cache = policy.init_cache(B, max_len, cfg.num_key_value_heads,
                                  cfg.head_dim, cfg.num_hidden_layers,
                                  dtype=cfg.jdtype)
        tok, cache = prefill_fn(params, stacked, ids, cache)
        np.asarray(tok)
        t0 = time.time()
        tok2, cache = decode_n(params, stacked, tok, cache)
        np.asarray(tok2)
        dt = time.time() - t0
        del cache
        return dt

    one()
    return med([one() for _ in range(3)]) / steps


def main():
    cfg = cfg7b()
    B = int(os.environ.get('PROF_BATCH', 64))
    steps = int(os.environ.get('PROF_STEPS', 64))
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True)
    policy = KVCachePolicy(method='fp')
    params = dict(model.params, blocks=[])
    stacked = stack_block_params(model.params['blocks'])
    model.params['blocks'] = []
    import gc
    gc.collect()
    out = {}

    # 1. full bench-shaped loop
    out['full_ms'] = decode_loop(cfg, policy, qmap, params, stacked,
                                 B, 32, steps, 32 + steps) * 1e3

    # 2. tiny cache: prefill 1 token, short max_len -> KV reads ~ nil
    out['tiny_cache_ms'] = decode_loop(cfg, policy, qmap, params, stacked,
                                       B, 1, steps, 1 + steps) * 1e3

    # 3. w4 weight stream: just the 4 fused linears x 32 layers via scan
    def run_lin(p, x, path):
        qc = qmap.get(path)
        return dequant_matmul(x, p['qweight'], p['scales'],
                              p.get('zeros'), qc.qmeta)

    def w4_stream(stacked, x0):
        def step(x, bp):
            a = bp['self_attn']
            qkv = run_lin(a['qkv_proj'], x, 'self_attn.qkv_proj')
            o = run_lin(a['o_proj'], qkv[..., :cfg.hidden_size],
                        'self_attn.o_proj')
            m = bp['mlp']
            gu = run_lin(m['gate_up_proj'], o, 'mlp.gate_up_proj')
            dn = run_lin(m['down_proj'], gu[..., :cfg.intermediate_size],
                         'mlp.down_proj')
            x = x0 * (1 + dn.astype(jnp.float32).mean() * 1e-9
                      ).astype(x0.dtype)
            return x, None
        x, _ = jax.lax.scan(step, x0, stacked)
        return x

    x0 = jnp.ones((B, cfg.hidden_size), cfg.jdtype)

    @jax.jit
    def w4_loop(stacked, x0):
        def outer(x, _):
            return w4_stream(stacked, x), None
        x, _ = jax.lax.scan(outer, x0, None, length=8)
        return x
    dt = time_fn(w4_loop, stacked, x0)
    out['w4_stream_ms'] = dt / 8 * 1e3

    # 4. bf16 stream of the same shapes
    D, I = cfg.hidden_size, cfg.intermediate_size
    qkv_w = jnp.ones((D, 3 * D), jnp.bfloat16)
    o_w = jnp.ones((D, D), jnp.bfloat16)
    gu_w = jnp.ones((D, 2 * I), jnp.bfloat16)
    dn_w = jnp.ones((I, D), jnp.bfloat16)

    @jax.jit
    def bf16_loop(ws, x0):
        qkv_w, o_w, gu_w, dn_w = ws

        def inner(x, _):
            q = x @ qkv_w
            o = q[..., :D] @ o_w
            g = o @ gu_w
            d = g[..., :I] @ dn_w
            return x0 * (1 + d.astype(jnp.float32).mean() * 1e-9
                         ).astype(x0.dtype), None

        def outer(x, _):
            x, _ = jax.lax.scan(inner, x, None, length=32)
            return x, None
        x, _ = jax.lax.scan(outer, x0, None, length=8)
        return x
    dt = time_fn(bf16_loop, (qkv_w, o_w, gu_w, dn_w), x0)
    out['bf16_stream_ms'] = dt / 8 * 1e3

    # 5. head alone
    head_w = jnp.ones((D, cfg.vocab_size), jnp.bfloat16)

    @jax.jit
    def head_loop(w, x0):
        def step(x, _):
            y = x @ w
            return x0 * (1 + y.astype(jnp.float32).mean() * 1e-9
                         ).astype(x0.dtype), None
        x, _ = jax.lax.scan(step, x0, None, length=64)
        return x
    dt = time_fn(head_loop, head_w, x0)
    out['lm_head_ms'] = dt / 64 * 1e3

    # 6. full loop at B=128
    try:
        out['b128_full_ms'] = decode_loop(cfg, policy, qmap, params,
                                          stacked, 128, 32, steps,
                                          32 + steps) * 1e3
        out['b128_tokens_per_s'] = 128 / (out['b128_full_ms'] / 1e3)
    except Exception as e:      # OOM guard
        out['b128_error'] = str(e)[:200]

    out['tokens_per_s_full'] = B / (out['full_ms'] / 1e3)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == '__main__':
    main()
