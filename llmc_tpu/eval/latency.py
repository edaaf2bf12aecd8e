"""Latency statistics: TTFT and decode tokens/s.

Reference counterpart: VQAEval's optional latency ``statistics`` hooks
with cuda-sync timers (/root/reference/llmc/eval/eval_vqa.py:32-56).
TPU-native: explicit block_until_ready timing around the jitted prefill
and scan-decode programs (BASELINE.md's p50 TTFT metric).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class LatencyEval:
    def __init__(self, prompt_len: int = 128, gen_len: int = 64,
                 batch: int = 1, iters: int = 5):
        self.prompt_len = prompt_len
        self.gen_len = gen_len
        self.batch = batch
        self.iters = iters

    def eval(self, model, qmap=None, kv_policy=None) -> Dict[str, float]:
        from ..serve.decode import forward_cached, init_cache
        from ..serve.kvcache import KVCachePolicy
        policy = kv_policy or KVCachePolicy(method='fp')
        cfg = model.cfg
        B, P, G = self.batch, self.prompt_len, self.gen_len
        params = model.params
        cache0 = init_cache(model, B, P + G, policy)

        @jax.jit
        def prefill(params, ids, cache):
            logits, cache = forward_cached(params, cfg, ids, cache,
                                           policy, qmap)
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                    cache)

        @jax.jit
        def decode(params, tok, cache):
            def step(carry, _):
                tok, cache = carry
                logits, cache = forward_cached(
                    params, cfg, tok[:, None], cache, policy, qmap)
                return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                        cache), None
            (tok, cache), _ = jax.lax.scan(step, (tok, cache), None,
                                           length=G)
            return tok, cache

        ids = jnp.asarray(np.random.RandomState(0).randint(
            0, cfg.vocab_size, (B, P)), jnp.int32)
        # warmup/compile
        tok, cache = prefill(params, ids, cache0)
        jax.block_until_ready(tok)
        tok2, _ = decode(params, tok, cache)
        jax.block_until_ready(tok2)

        ttfts, dps = [], []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            tok, cache = prefill(params, ids, cache0)
            jax.block_until_ready(tok)
            ttfts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            tok2, _ = decode(params, tok, cache)
            jax.block_until_ready(tok2)
            dt = time.perf_counter() - t0
            dps.append(B * G / dt)
        return {
            'ttft_p50_ms': float(np.percentile(ttfts, 50) * 1e3),
            'ttft_p99_ms': float(np.percentile(ttfts, 99) * 1e3),
            'decode_tokens_per_s': float(np.median(dps)),
            'prefill_tokens_per_s': float(B * P /
                                          np.percentile(ttfts, 50)),
        }
