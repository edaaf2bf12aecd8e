"""VQA evaluation for VLMs.

Reference: /root/reference/llmc/eval/eval_vqa.py:18-302 — an lmms-eval
integration plus optional prefill/decode latency statistics hooks
(:32-56).  lmms-eval is not installed in this environment, so:

- ``VQAEval`` is a NATIVE evaluator: greedy-generates an answer for each
  (image, question) sample through the VLM forward and scores exact /
  substring match — the mechanics every lmms-eval task reduces to;
- ``LmmsEvalAdapter`` is the gated integration (ImportError without the
  optional ``lmms_eval`` package), mirroring eval/harness.LMEvalAdapter;
- latency statistics (prefill wall / per-answer decode wall) are always
  collected, the analog of the reference's statistics hooks.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class VQAEval:
    """Native VQA scoring over explicit samples.

    samples: [{'input_ids': [S] int (prompt incl. image placeholders),
               'pixel_values'/'pixel_patches'/...: model-specific image
               kwargs, 'answer_ids': [A] int}]
    A sample scores 1 when the first len(answer_ids) greedy tokens equal
    answer_ids (exact match) — substring match when ``substring=True``.
    """

    def __init__(self, samples: Sequence[Dict], max_new_tokens: int = 8,
                 substring: bool = False, use_cache: str = 'auto'):
        self.samples = list(samples)
        self.max_new_tokens = max_new_tokens
        self.substring = substring
        # 'auto': KV-cached generation (serve/decode.vlm_greedy_generate)
        # when the model exposes prefill_embeds and the active reduction
        # is tower-side; falls back to the eager re-forward loop (the
        # LM-side reduction methods prune mid-forward and need it).
        self.use_cache = use_cache
        self.statistics: Dict = {}

    def _gen_cached(self, model, qmap, ids, img_kwargs, n_new):
        from ..serve.decode import vlm_greedy_generate
        t = {}
        out = vlm_greedy_generate(model, ids, n_new, qmap=qmap,
                                  timings=t, **img_kwargs)
        return (np.asarray(out)[0, -n_new:].tolist(), t['prefill_s'],
                t['decode_s'])

    def eval(self, model, qmap=None) -> Dict:
        correct = 0
        prefill_time = 0.0
        decode_time = 0.0
        n_decode_tokens = 0
        cached_ok = (self.use_cache in ('auto', True)
                     and hasattr(model, 'prefill_embeds'))
        for s in self.samples:
            ids = jnp.asarray(np.asarray(s['input_ids'],
                                         np.int32)[None, :])
            img_kwargs = {k: (jnp.asarray(v)
                              if isinstance(v, np.ndarray) else v)
                          for k, v in s.items()
                          if k not in ('input_ids', 'answer_ids')}
            answer = list(np.asarray(s['answer_ids']).tolist())
            n_new = (len(answer) if not self.substring
                     else self.max_new_tokens)
            if cached_ok:
                try:
                    toks, pt, dt = self._gen_cached(
                        model, qmap, ids, img_kwargs,
                        min(n_new, self.max_new_tokens))
                    prefill_time += pt
                    decode_time += dt
                    n_decode_tokens += max(len(toks) - 1, 0)
                    correct += int(_contains(toks, answer)
                                   if self.substring
                                   else toks[:len(answer)] == answer)
                    continue
                except (NotImplementedError, TypeError):
                    # LM-side reduction, or the adapter's prefill_embeds
                    # doesn't take this modality's kwargs: go eager
                    cached_ok = False
            toks = []
            cur = ids
            t0 = time.time()
            for step in range(self.max_new_tokens):
                logits = model.forward_logits(cur, qmap=qmap,
                                              **img_kwargs)
                nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
                if step == 0:
                    prefill_time += time.time() - t0
                    t0 = time.time()
                toks.append(nxt)
                cur = jnp.concatenate(
                    [cur, jnp.asarray([[nxt]], cur.dtype)], axis=1)
                if len(toks) >= len(answer) and not self.substring:
                    break
            decode_time += time.time() - t0
            n_decode_tokens += max(len(toks) - 1, 0)
            if self.substring:
                hit = _contains(toks, answer)
            else:
                hit = toks[:len(answer)] == answer
            correct += int(hit)
        n = max(len(self.samples), 1)
        self.statistics = {
            'prefill_time_s': prefill_time,
            'decode_time_s': decode_time,
            'decode_tokens': n_decode_tokens,
            'prefill_p50_ms': prefill_time / n * 1e3,
        }
        return {'accuracy': correct / n, 'n': n, **self.statistics}


def _contains(seq: List[int], sub: List[int]) -> bool:
    if not sub:
        return True
    for i in range(len(seq) - len(sub) + 1):
        if seq[i:i + len(sub)] == sub:
            return True
    return False


class LmmsEvalAdapter:
    """Gated lmms-eval integration (reference eval_vqa.py:57-302 wraps
    the llava lmms-eval model class).  Requires the optional
    ``lmms_eval`` package; constructing without it raises ImportError."""

    def __init__(self, model, qmap=None, batch_size: int = 1):
        import lmms_eval  # noqa: F401  (optional dep gate)
        self._model = model
        self._qmap = qmap
        self.batch_size = batch_size

    def evaluate(self, tasks: List[str], limit: Optional[int] = None):
        import lmms_eval
        from lmms_eval.evaluator import simple_evaluate
        return simple_evaluate(model=self._wrap(), tasks=tasks,
                               limit=limit, batch_size=self.batch_size)

    def _wrap(self):
        from lmms_eval.api.model import lmms
        outer = self

        class _Wrapped(lmms):
            def generate_until(self, requests):
                outs = []
                for r in requests:
                    ctx = r.args[0]
                    tok = outer._model.tokenizer
                    ids = jnp.asarray(
                        np.asarray(tok(ctx)['input_ids'],
                                   np.int32)[None, :])
                    from ..serve.decode import greedy_generate
                    out = greedy_generate(outer._model, ids, 32,
                                          qmap=outer._qmap)
                    outs.append(tok.decode(
                        np.asarray(out)[0, ids.shape[1]:]))
                return outs

            def loglikelihood(self, requests):
                raise NotImplementedError

            def loglikelihood_rolling(self, requests):
                raise NotImplementedError
        return _Wrapped()
