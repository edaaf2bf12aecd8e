"""Long-context FULL-GRAPH decode marginal: which attention impl wins
inside the real decode loop (not isolated) at long-context serving
shapes (VERDICT r4 #7).

The r4 dispatch boundary (flash for B<=8, S>=4096) was set from
ISOLATED attention timings; r5 found that a Pallas custom call inside
the real graph can defeat XLA's in-place cache updates (PERF.md r5), so
the boundary must be validated on the full graph.  Methodology: marginal
(two step counts differenced), fabricated prefilled cache (random codes
at pos — values are garbage, timing is identical), one process at a
time.

  flock /tmp/tpu.lock python tools/longctx_probe.py
Env: LCX_CASES="B,S;B,S" (default "8,4096;16,2048"), LCX_STEPS (32).
"""

import functools
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

STEPS = int(os.environ.get('LCX_STEPS', '32'))


def cfg7b():
    return LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=32,
                       head_dim=128, dtype='bfloat16')


def run_case(cfg, policy, qmap, params, B, max_len, impl):
    D.ATTN_IMPL = impl
    rs = np.random.RandomState(0)
    pos0 = max_len - STEPS - 2
    half = STEPS // 2

    @functools.partial(jax.jit, static_argnames=())
    def _fill(key):
        c = policy.init_cache(B, max_len, cfg.num_key_value_heads,
                              cfg.head_dim, cfg.num_hidden_layers,
                              dtype=cfg.jdtype)
        k1, k2 = jax.random.split(key)
        # fabricated prefix ON DEVICE (host uploads of multi-GB buffers
        # hang the tunnel); decode timing is value-independent
        c['k_q'] = jax.random.randint(k1, c['k_q'].shape, -127, 128,
                                      jnp.int8)
        c['v_q'] = jax.random.randint(k2, c['v_q'].shape, -127, 128,
                                      jnp.int8)
        c['k_s'] = jax.random.uniform(k1, c['k_s'].shape, jnp.float32,
                                      .01, .03)
        c['v_s'] = jax.random.uniform(k2, c['v_s'].shape, jnp.float32,
                                      .01, .03)
        c['pos'] = jnp.asarray(pos0, jnp.int32)
        return c

    def fresh_cache(seed):
        return _fill(jax.random.PRNGKey(seed))

    # layer-loop strategy EXACTLY as the bench ships it: stacked blocks,
    # unrolled in-place updates below the 2^31-element buffer boundary,
    # scan-over-layers above it.  (The first version of this probe ran
    # the python-loop unrolled path on at-boundary buffers and measured
    # the degraded whole-buffer-copy pathology, not attention.)
    stacked = D.stack_block_params(params['blocks'])
    p2 = dict(params, blocks=[])
    unroll = D.prefer_unroll(B, max_len, cfg.num_key_value_heads,
                             cfg.head_dim, cfg.num_hidden_layers)

    def mk(n):
        # weights enter as ARGUMENTS (closure device arrays become jit
        # constants: buffer-sized remote-compile payloads)
        @functools.partial(jax.jit, donate_argnums=(2,))
        def dec(p2, stacked, cache, tok):
            def step(carry, _):
                tok, cache = carry
                logits, cache = D.forward_cached(
                    p2, cfg, tok[:, None], cache, policy, qmap,
                    stacked_blocks=stacked, unroll=unroll)
                return (jnp.argmax(logits[:, -1],
                                   -1).astype(jnp.int32), cache), None
            (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                           length=n)
            return tok, cache
        return dec

    dfull, dhalf = mk(STEPS), mk(half)

    seeds = iter(range(100))

    def one(fn):
        cache = fresh_cache(next(seeds))
        tok = jnp.asarray(rs.randint(0, cfg.vocab_size, (B,)), jnp.int32)
        jax.block_until_ready(cache['k_s'])
        t0 = time.time()
        tok2, cache = fn(p2, stacked, cache, tok)
        np.asarray(tok2)
        dt = time.time() - t0
        del cache
        return dt

    try:
        one(dfull)
        one(dhalf)
        t_full = sorted(one(dfull) for _ in range(3))[1]
        t_half = sorted(one(dhalf) for _ in range(3))[1]
        ms = (t_full - t_half) / (STEPS - half) * 1e3
        toks = B / ms * 1e3
        print(f'  B={B:4d} S={max_len:6d} {impl:8s}: '
              f'{ms:8.2f} ms/step  {toks:8.1f} tok/s', flush=True)
    except Exception as e:
        print(f'  B={B:4d} S={max_len:6d} {impl:8s}: FAIL '
              f'{str(e)[:140]}', flush=True)


def main():
    cfg = cfg7b()
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True, head=True)
    policy = KVCachePolicy(method='naive', bit=8)
    params = model.params
    cases = os.environ.get('LCX_CASES', '4,2048;8,1024;16,512;1,8192;64,192')
    for case in cases.split(';'):
        B, S = (int(x) for x in case.split(','))
        for impl in ('chunked', 'flash', 'batch'):
            run_case(cfg, policy, qmap, params, B, S, impl)


if __name__ == '__main__':
    main()
