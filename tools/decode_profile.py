"""Component-isolation profile of one 7B W4A16 decode step on the TPU.

Round-4 shape (matches bench.py defaults): B=128, int8 KV, packed w4
lm_head, UNROLLED layer loop.  Terms, per decode step:

  full          - the bench's exact decode scan (reference point)
  tiny_cache    - same program, (almost) empty KV cache: full minus
                  KV reads => attention-read cost = full - tiny_cache
  w4_stream     - ONLY the 4 fused packed linears x 32 layers (the
                  Pallas w4 kernel stream)
  lm_head       - the packed w4 head matmul alone
  bf16_stream   - same linear shapes in plain bf16 (chip best case)
  glue          - full - w4_stream - attention - head (norms, rope,
                  sampling, embed, cache write)

Each term is printed with its own HBM byte count and implied GB/s so
the per-term roofline fractions can be read directly (PERF.md r4).

Run on the real chip (no JAX_PLATFORMS override):
    python tools/decode_profile.py
Env: PROF_BATCH (128), PROF_STEPS (64), PROF_KV (int8|fp),
     PROF_HEAD (packed|fp).
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
from llmc_tpu.serve.decode import forward_cached
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


def decode_loop(cfg, policy, qmap, params, B, prefill, steps, max_len):
    """Bench-shaped loop: unrolled layers (params carry blocks),
    donated cache, fresh prompt per round."""
    rs = np.random.RandomState(0)
    ids_rounds = jnp.asarray(rs.randint(
        0, cfg.vocab_size, size=(8, B, prefill)), jnp.int32)
    rix = iter(range(8))

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill_fn(params, ids, cache):
        logits, cache = forward_cached(params, cfg, ids, cache, policy,
                                       qmap, last_only=True, unroll=True)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(params, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = forward_cached(params, cfg, tok[:, None],
                                           cache, policy, qmap)
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                    cache), None
        (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                       length=steps)
        return tok, cache

    def one():
        cache = policy.init_cache(B, max_len, cfg.num_key_value_heads,
                                  cfg.head_dim, cfg.num_hidden_layers,
                                  dtype=cfg.jdtype)
        tok, cache = prefill_fn(params, ids_rounds[next(rix)], cache)
        np.asarray(tok)
        t0 = time.time()
        tok2, cache = decode_n(params, tok, cache)
        np.asarray(tok2)
        dt = time.time() - t0
        del cache
        return dt

    one()
    return med([one() for _ in range(3)]) / steps


def main():
    cfg = cfg7b()
    B = int(os.environ.get('PROF_BATCH', 128))
    steps = int(os.environ.get('PROF_STEPS', 64))
    kv_mode = os.environ.get('PROF_KV', 'int8')
    head_mode = os.environ.get('PROF_HEAD', 'packed')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True,
                                      head=head_mode == 'packed')
    policy = (KVCachePolicy(method='naive', bit=8) if kv_mode == 'int8'
              else KVCachePolicy(method='fp'))
    params = model.params          # blocks kept: unrolled layer loop
    out = {'batch': B, 'kv': kv_mode, 'head': head_mode}

    def note(k):
        import sys as _sys
        print(json.dumps({k: round(out[k], 3)}), file=_sys.stderr,
              flush=True)

    # 1. full bench-shaped loop
    out['full_ms'] = decode_loop(cfg, policy, qmap, params,
                                 B, 32, steps, 32 + steps) * 1e3
    note('full_ms')

    # 2. tiny cache: SAME max_len (so the chunked-attention program is
    # identical) but a 1-token prefill: the valid KV prefix per step is
    # ~31 tokens shorter on average.  attention/token = delta/31;
    # attention at the bench's average valid length = that * (32+steps/2)
    out['tiny_cache_ms'] = decode_loop(cfg, policy, qmap, params,
                                       B, 1, steps, 32 + steps) * 1e3
    note('tiny_cache_ms')

    # 3. w4 weight stream: just the 4 fused linears x 32 layers
    def run_lin(p, x, path):
        qc = qmap.get(path)
        return dequant_matmul(x, p['qweight'], p['scales'],
                              p.get('zeros'), qc.qmeta)

    def w4_stream(params, x0):
        x = x0
        for bp in params['blocks']:
            a = bp['self_attn']
            qkv = run_lin(a['qkv_proj'], x, 'self_attn.qkv_proj')
            o = run_lin(a['o_proj'], qkv[..., :cfg.hidden_size],
                        'self_attn.o_proj')
            m = bp['mlp']
            gu = run_lin(m['gate_up_proj'], o, 'mlp.gate_up_proj')
            dn = run_lin(m['down_proj'], gu[..., :cfg.intermediate_size],
                         'mlp.down_proj')
            # chain layers with an elementwise add (no cross-lane
            # reduce: a scalar mean per layer serializes the stream and
            # overstates the term)
            x = (x0 + dn * 1e-9).astype(x0.dtype)
        return x

    x0 = jnp.ones((B, cfg.hidden_size), cfg.jdtype)

    @jax.jit
    def w4_loop(params, x0):
        def outer(x, _):
            return w4_stream(params, x), None
        x, _ = jax.lax.scan(outer, x0, None, length=8)
        return x
    dt = time_fn(w4_loop, params, x0)
    out['w4_stream_ms'] = dt / 8 * 1e3
    note('w4_stream_ms')

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
    note('bf16_stream_ms')

    # 5. head alone (same storage the bench serves: packed w4 or bf16)
    from llmc_tpu.models import llama as L

    @jax.jit
    def head_loop(params, x0):
        def step(x, _):
            y = L.head_apply(params, cfg, x[:, None], qmap=qmap)
            return x0 * (1 + y.astype(jnp.float32).mean() * 1e-9
                         ).astype(x0.dtype), None
        x, _ = jax.lax.scan(step, x0, None, length=64)
        return x
    dt = time_fn(head_loop, params, x0)
    out['lm_head_ms'] = dt / 64 * 1e3
    note('lm_head_ms')

    # ---- per-term byte-rooflines (int8-KV/packed-head aware) --------
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    Lc = cfg.num_hidden_layers
    lin_params = Lc * (D * hd * (H + 2 * KVH) + H * hd * D + 3 * D * I)
    w4_bytes = lin_params * 0.5 + lin_params / wspec.group_size * 4
    if head_mode == 'packed':
        head_bytes = (cfg.vocab_size * D * 0.5
                      + cfg.vocab_size * (D / wspec.group_size) * 8)
    else:
        head_bytes = cfg.vocab_size * D * 2
    valid = 32 + steps / 2
    kv_elt = (1 + 4.0 / hd) if kv_mode == 'int8' else 2
    kv_bytes = 2 * Lc * B * valid * KVH * hd * kv_elt
    per_tok_ms = (out['full_ms'] - out['tiny_cache_ms']) / 31.0
    attn_ms = per_tok_ms * (32 + steps / 2)
    glue_ms = (out['tiny_cache_ms'] - out['w4_stream_ms']
               - out['lm_head_ms'])
    out['attention_ms'] = attn_ms
    out['glue_ms'] = glue_ms
    out['w4_stream_gbs'] = w4_bytes / (out['w4_stream_ms'] / 1e3) / 1e9
    out['lm_head_gbs'] = head_bytes / (out['lm_head_ms'] / 1e3) / 1e9
    if attn_ms > 0:
        out['attention_gbs'] = kv_bytes / (attn_ms / 1e3) / 1e9
    out['tokens_per_s_full'] = B / (out['full_ms'] / 1e3)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == '__main__':
    main()
