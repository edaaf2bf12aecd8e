"""Bisect the B=256 full-graph collapse (attn_b256_probe shows isolated
attention scales ~linearly, so the collapse is an interaction).

Runs the bench decode loop at B in {128, 256} with graph variants:

  full         - unmodified (reference point)
  no_attnread  - _decode_attn_chunked patched to return q (cache write
                 + quantize kept; isolates the READ side)
  no_kvwrite   - policy.update patched to identity (read over the stale
                 cache kept; isolates the WRITE/quantize side)
  no_attn      - both patched (the pure linear+glue skeleton)

Prints ms/step per variant.  Run on the real chip.
Env: BIS_BS (default "128,256"), BIS_STEPS (32).
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
from llmc_tpu.quant import QuantSpec
from llmc_tpu.serve import decode as D
from llmc_tpu.serve.kvcache import KVCachePolicy
from llmc_tpu.serve.packed import random_packed_llama

STEPS = int(os.environ.get('BIS_STEPS', '32'))


def cfg7b():
    return LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=32,
                       head_dim=128, dtype='bfloat16')


def run_loop(cfg, policy, qmap, params, B):
    """MARGINAL ms/step: (T_full - T_half)/(STEPS - STEPS/2) with the
    SAME max_len for both step counts — cancels the large fixed
    per-invocation overheads (donation copies, dispatch, transfers)
    that drown the per-step signal at B=256."""
    rs = np.random.RandomState(0)
    ids_rounds = jnp.asarray(rs.randint(
        0, cfg.vocab_size, size=(16, B, 32)), jnp.int32)
    rix = iter(range(16))
    max_len = 32 + STEPS
    half = STEPS // 2

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_fn(params, cache, ids):
        logits, cache = D.forward_cached(params, cfg, ids, cache, policy,
                                         qmap, last_only=True,
                                         unroll=True)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    def mk_decode(n):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_n(params, cache, tok):
            def step(carry, _):
                tok, cache = carry
                logits, cache = D.forward_cached(params, cfg,
                                                 tok[:, None], cache,
                                                 policy, qmap)
                return (jnp.argmax(logits[:, -1],
                                   -1).astype(jnp.int32), cache), None
            (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                           length=n)
            return tok, cache
        return decode_n

    dec_full, dec_half = mk_decode(STEPS), mk_decode(half)

    def one(fn):
        cache = policy.init_cache(B, max_len, cfg.num_key_value_heads,
                                  cfg.head_dim, cfg.num_hidden_layers,
                                  dtype=cfg.jdtype)
        tok, cache = prefill_fn(params, cache, ids_rounds[next(rix)])
        np.asarray(tok)
        t0 = time.time()
        tok2, cache = fn(params, cache, tok)
        np.asarray(tok2)
        dt = time.time() - t0
        del cache
        return dt

    one(dec_full)
    one(dec_half)
    t_full = sorted(one(dec_full) for _ in range(3))[1]
    t_half = sorted(one(dec_half) for _ in range(3))[1]
    return (t_full - t_half) / (STEPS - half) * 1e3


def main():
    cfg = cfg7b()
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True, head=True)
    policy = KVCachePolicy(method='naive', bit=8)
    params = model.params

    orig_attn = D._decode_attn_chunked
    orig_update = KVCachePolicy.update

    def attn_skip(q, cache, layer, policy, cfg, chunk):
        return q.astype(jnp.float32)

    def update_skip(self, cache, layer, k, v):
        return cache

    bs = [int(b) for b in os.environ.get('BIS_BS', '128,256').split(',')]
    for B in bs:
        for name, pa, pu in (('full', orig_attn, orig_update),
                             ('no_attnread', attn_skip, orig_update),
                             ('no_kvwrite', orig_attn, update_skip),
                             ('no_attn', attn_skip, update_skip)):
            D._decode_attn_chunked = pa
            KVCachePolicy.update = pu
            for attempt in range(4):
                try:
                    ms = run_loop(cfg, policy, qmap, params, B)
                    print(json.dumps({f'b{B}_{name}_ms': round(ms, 3)}),
                          flush=True)
                    break
                except Exception as e:      # noqa: BLE001
                    print(json.dumps({'retry': f'b{B}_{name}',
                                      'err': str(e)[:120]}), flush=True)
                    time.sleep(60 * (attempt + 1))
            D._decode_attn_chunked = orig_attn
            KVCachePolicy.update = orig_update


if __name__ == '__main__':
    main()
