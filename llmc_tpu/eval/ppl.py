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
    quantization is exercised.

    Protocol parity: the reference iterates the first ``num_samples``
    RAW dataset texts, tokenizes each one whole (variable length — no
    seq_len chunking), decodes token by token, and reports
    exp(mean per-token NLL) pooled over texts (eval_base.py:78-80,
    eval_ppl.py:61-93).  Pass ``texts`` + ``tokenizer`` for that path;
    the ids/seq_len form is kept for synthetic data."""

    def __init__(self, test_ids: Optional[np.ndarray] = None,
                 seq_len: int = 2048, num_samples: int = 4,
                 texts=None, tokenizer=None):
        if texts is not None:
            self.texts = list(texts)[:num_samples]
            self.tokenizer = tokenizer
            self.chunks = None
        else:
            ids = np.asarray(test_ids).reshape(-1)
            n = min(num_samples, ids.shape[0] // seq_len)
            self.chunks = ids[:n * seq_len].reshape(n, seq_len)

    def eval(self, model, qmap=None, kv_policy=None) -> float:
        from ..serve.decode import decode_nll
        total, count = 0.0, 0
        if self.chunks is not None:
            for chunk in self.chunks:
                nll, n = decode_nll(model, jnp.asarray(chunk[None, :]),
                                    qmap=qmap, kv_policy=kv_policy)
                total += float(nll)
                count += int(n)
            return float(np.exp(total / count))
        # Reference protocol quirk mirrored exactly: reset_kv sits
        # OUTSIDE its text loop (eval_ppl.py:69-92), so the KV cache
        # persists across texts — later texts decode conditioned on the
        # earlier ones — and each text's LAST token is a label but never
        # an input.  Build one fed/label/mask stream accordingly.
        fed, lab, mask = [], [], []
        for text in self.texts:
            ids = np.asarray(self.tokenizer(text)['input_ids'],
                             np.int32).reshape(-1)
            if ids.size < 2:
                continue  # reference's per-token loop is empty too
            fed.append(ids[:-1])
            lab.append(ids[1:])
            mask.append(np.ones(ids.size - 1, bool))
        if not fed:
            return float('nan')
        F = np.concatenate(fed)
        L = np.concatenate(lab)
        M = np.concatenate(mask)
        pad = (-F.size) % 64   # bucket so XLA's cache can reuse programs
        F, L = np.pad(F, (0, pad)), np.pad(L, (0, pad))
        M = np.pad(M, (0, pad))
        nll, n = decode_nll(model, jnp.asarray(F[None, :]),
                            qmap=qmap, kv_policy=kv_policy,
                            labels=jnp.asarray(L[None, :]),
                            score_mask=M)
        return float(np.exp(float(nll) / max(n, 1)))
