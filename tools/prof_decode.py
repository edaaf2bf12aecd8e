"""Component-level timing of one 7B W4A16 decode step on the real chip.

Times, per decode step (B from BENCH_BATCH, default 32):
  full      - the bench's forward_cached step (scan over layers)
  linears   - only the packed linears (qkv/o/gate_up/down) per layer
  attn      - only cache update + read + attention math per layer
  head      - lm_head matmul + argmax
  norms     - rms norms + rope + embed

Run from /root/repo with default env (real TPU):
  python tools/prof_decode.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from llmc_tpu.models import LlamaConfig
from llmc_tpu.models import llama as L
from llmc_tpu.models.base import linear_apply, rms_norm
from llmc_tpu.quant import QuantSpec
from llmc_tpu.serve.decode import (forward_cached, init_cache,
                                   stack_block_params)
from llmc_tpu.serve.kvcache import KVCachePolicy
from llmc_tpu.serve.packed import random_packed_llama

F32 = jnp.float32


def timeit(fn, *args, reps=3, steps=32):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)  # hard sync
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        times.append(time.time() - t0)
    return sorted(times)[reps // 2] / steps


def main():
    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      head_dim=128, dtype='bfloat16')
    B = int(os.environ.get('BENCH_BATCH', 32))
    steps = 32
    prefill_len = 32
    max_len = prefill_len + 128
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True)
    policy = KVCachePolicy(method='fp')
    params = model.params
    stacked = stack_block_params(params['blocks'])
    params = dict(params, blocks=[])
    model.params['blocks'] = []
    import gc
    gc.collect()
    cache = init_cache(model, B, max_len, policy)
    cache = dict(cache, pos=jnp.asarray(prefill_len, jnp.int32))

    tok = jnp.zeros((B,), jnp.int32)
    x = jnp.zeros((B, 1, cfg.hidden_size), jnp.bfloat16)

    n_layers = cfg.num_hidden_layers
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)

    @jax.jit
    def full(params, stacked, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = forward_cached(params, cfg, tok[:, None],
                                           cache, policy, qmap,
                                           stacked_blocks=stacked)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), None
        (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                       length=steps)
        return tok

    def qc(path):
        return qmap.get(path)

    @jax.jit
    def linears_only(stacked, x):
        def step(x, _):
            def layer(x, bp):
                B_, S, D = x.shape
                qkv = linear_apply(bp['self_attn']['qkv_proj'], x,
                                   qc('self_attn.qkv_proj'))
                ctx = qkv[..., :H * hd]
                x = x + linear_apply(bp['self_attn']['o_proj'], ctx,
                                     qc('self_attn.o_proj'))
                gu = linear_apply(bp['mlp']['gate_up_proj'], x,
                                  qc('mlp.gate_up_proj'))
                I = gu.shape[-1] // 2
                x = x + linear_apply(bp['mlp']['down_proj'],
                                     jax.nn.silu(gu[..., :I].astype(F32))
                                     .astype(x.dtype) * gu[..., I:],
                                     qc('mlp.down_proj'))
                return x, None
            x, _ = jax.lax.scan(layer, x, stacked)
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=steps)
        return x

    @jax.jit
    def attn_only(x, cache):
        q0 = jnp.zeros((B, 1, H, hd), jnp.bfloat16)
        kv0 = jnp.zeros((B, 1, KVH, hd), jnp.bfloat16)

        def step(carry, _):
            x, cache = carry
            def layer(carry, layer_idx):
                x, cache = carry
                q = q0 + x[..., :1, None]
                k = kv0 + x[..., :1, None]
                v = kv0 + x[..., :1, None]
                cache = policy.update(cache, layer_idx, k, v)
                k_full, v_full = policy.read(cache, layer_idx, x.dtype)
                pos = cache['pos']
                scores = jnp.einsum('bqhd,bkhd->bhqk', q, k_full,
                                    preferred_element_type=F32) / 11.3
                kv_idx = jnp.arange(k_full.shape[1])[None, :]
                valid = kv_idx <= pos + jnp.arange(1)[:, None]
                scores = jnp.where(valid[None, None], scores, -jnp.inf)
                probs = jax.nn.softmax(scores, -1).astype(x.dtype)
                ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v_full,
                                 preferred_element_type=F32)
                x = x + ctx.reshape(B, 1, -1).astype(x.dtype)
                return (x, cache), None
            (x, cache), _ = jax.lax.scan(layer, (x, cache),
                                         jnp.arange(n_layers))
            return (x, dict(cache, pos=cache['pos'])), None
        (x, cache), _ = jax.lax.scan(step, (x, cache), None, length=steps)
        return x

    @jax.jit
    def head_only(params, x):
        def step(x, _):
            logits = L.head_apply(params, cfg, x)
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            return x + nxt[:, None, None].astype(x.dtype) * 0, None
        x, _ = jax.lax.scan(step, x, None, length=steps)
        return x

    res = {}
    res['full'] = timeit(full, params, stacked, tok, cache, steps=steps)
    res['linears'] = timeit(linears_only, stacked, x, steps=steps)
    res['attn'] = timeit(attn_only, x, cache, steps=steps)
    res['head'] = timeit(head_only, params, x, steps=steps)
    for k, v in res.items():
        print(f'{k:10s} {v*1e3:8.3f} ms/step')
    # roofline arithmetic
    D, I, Lr = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    lin_params = Lr * (D * hd * (H + 2 * KVH) + H * hd * D + 3 * D * I)
    w_bytes = lin_params * 0.5 + lin_params / 128 * 4
    kv_bytes = 2 * Lr * B * max_len * KVH * hd * 2
    head_bytes = cfg.vocab_size * D * 2
    print(f'w_bytes {w_bytes/1e9:.2f}GB -> ideal '
          f'{w_bytes/819e9*1e3:.2f} ms')
    print(f'kv full-pad {kv_bytes/1e9:.2f}GB -> ideal '
          f'{kv_bytes/819e9*1e3:.2f} ms')
    print(f'head {head_bytes/1e9:.3f}GB -> ideal '
          f'{head_bytes/819e9*1e3:.3f} ms')


if __name__ == '__main__':
    main()
