"""Perplexity / token-consistency evaluation.

Reference: /root/reference/llmc/eval/eval_ppl.py:13-93 (seq-chunked PPL and
decode PPL), eval_token_consist.py:9-72 (argmax agreement), eval/utils.py
(eval positions, re-deploy between positions).

TPU-native: one jitted loss step reused across chunks; the model is
(params, qmap) so "re-deploying" between eval positions is just passing a
different qmap (no module surgery).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def _nll_step(model, qmap):
    head = model.head_fn()
    bfn = model.block_fn()

    def step(params, ids):
        x, kw = model.embed_and_rope_p(params, ids)
        for bp in params['blocks']:
            x, _, _ = bfn(bp, x, kw, qmap=qmap)
        logits = head(params, x)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(F32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size
    return step


class PerplexityEval:
    """Sequence-chunked PPL (eval_ppl.py:13-58)."""

    def __init__(self, test_ids: np.ndarray, seq_len: int = 2048,
                 bs: int = 1):
        ids = np.asarray(test_ids).reshape(-1)
        n = ids.shape[0] // seq_len
        self.chunks = ids[:n * seq_len].reshape(n, seq_len)
        self.bs = bs
        self.seq_len = seq_len

    def eval(self, model, qmap=None) -> float:
        step = jax.jit(_nll_step(model, qmap))
        total, count = 0.0, 0
        for i in range(0, len(self.chunks), self.bs):
            batch = jnp.asarray(self.chunks[i:i + self.bs])
            nll, sz = step(model.params, batch)  # tail batch = 2nd compile
            total += float(nll)
            count += int(sz)
        return float(np.exp(total / count))


class TokenConsistencyEval:
    """Argmax-token agreement between two deploy stages
    (eval_token_consist.py:9-72)."""

    def __init__(self, test_ids: np.ndarray, seq_len: int = 2048,
                 bs: int = 1):
        ids = np.asarray(test_ids).reshape(-1)
        n = ids.shape[0] // seq_len
        self.chunks = ids[:n * seq_len].reshape(n, seq_len)
        self.bs = bs

    def eval(self, model, qmap_a=None, qmap_b=None) -> float:
        def make(qmap):
            head = model.head_fn()
            bfn = model.block_fn()

            def fwd(params, ids):
                x, kw = model.embed_and_rope_p(params, ids)
                for bp in params['blocks']:
                    x, _, _ = bfn(bp, x, kw, qmap=qmap)
                return jnp.argmax(head(params, x), axis=-1)
            return jax.jit(fwd)
        fa, fb = make(qmap_a), make(qmap_b)
        agree, total = 0, 0
        for i in range(0, len(self.chunks), self.bs):
            batch = jnp.asarray(self.chunks[i:i + self.bs])
            ta, tb = fa(model.params, batch), fb(model.params, batch)
            agree += int(jnp.sum(ta == tb))
            total += int(ta.size)
        return agree / total


class DecodePerplexityEval:
    """Token-by-token decode PPL through the (quantized) KV cache
    (eval_ppl.py:61-93).  Uses the serving decode path so KV-cache
    quantization is exercised."""

    def __init__(self, test_ids: np.ndarray, seq_len: int = 2048,
                 num_samples: int = 4):
        ids = np.asarray(test_ids).reshape(-1)
        n = min(num_samples, ids.shape[0] // seq_len)
        self.chunks = ids[:n * seq_len].reshape(n, seq_len)

    def eval(self, model, qmap=None, kv_policy=None) -> float:
        from ..serve.decode import decode_nll
        total, count = 0.0, 0
        for chunk in self.chunks:
            nll, n = decode_nll(model, jnp.asarray(chunk[None, :]),
                                qmap=qmap, kv_policy=kv_policy)
            total += float(nll)
            count += int(n)
        return float(np.exp(total / count))
