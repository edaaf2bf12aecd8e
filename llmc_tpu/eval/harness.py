"""Eval orchestration + generation-based evaluators.

Reference: /root/reference/llmc/eval/utils.py:12-93 (get_eval_list /
eval_model with re-deploy between positions), eval_custom_generate.py
(CustomGenerate), and the lm-eval external-process harness
(tools/llm_eval.py).  Here re-deploying is just passing a different QMap.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class CustomGenerate:
    """Free-form greedy generation dumps (eval_custom_generate.py:13-59)."""

    def __init__(self, prompts: List[str], max_new_tokens: int = 64):
        self.prompts = prompts
        self.max_new_tokens = max_new_tokens

    def eval(self, model, qmap=None) -> List[str]:
        from ..serve.decode import greedy_generate
        tok = model.tokenizer
        outs = []
        for prompt in self.prompts:
            if tok is not None:
                ids = np.asarray(tok(prompt)['input_ids'],
                                 np.int32)[None, :]
            else:
                ids = np.frombuffer(prompt.encode()[:32],
                                    np.uint8).astype(np.int32)[None, :]
            out = greedy_generate(model, jnp.asarray(ids),
                                  self.max_new_tokens, qmap=qmap)
            new = np.asarray(out)[0, ids.shape[1]:]
            outs.append(tok.decode(new) if tok is not None
                        else new.tolist())
        return outs


class LMEvalAdapter:
    """Adapter exposing our model to lm-evaluation-harness (the
    reference shells out to a separate process, tools/llm_eval.py:30-46;
    we implement the LM API natively).  Requires the optional `lm_eval`
    package; constructing without it raises ImportError."""

    def __init__(self, model, qmap=None, batch_size: int = 1,
                 max_length: int = 2048):
        import lm_eval  # noqa: F401  (optional dep gate)
        from lm_eval.api.model import LM
        self._model = model
        self._qmap = qmap
        outer = self

        class _Wrapped(LM):
            def loglikelihood(self, requests):
                return [outer._loglikelihood(r.args[0], r.args[1])
                        for r in requests]

            def loglikelihood_rolling(self, requests):
                return [outer._rolling_ll(r.args[0]) for r in requests]

            def generate_until(self, requests):
                return [outer._generate(r.args[0], r.args[1])
                        for r in requests]

        self.lm = _Wrapped()

    # -- helpers ---------------------------------------------------------
    def _encode(self, text):
        return np.asarray(self._model.tokenizer(text)['input_ids'],
                          np.int32)

    def _logprobs(self, ids: np.ndarray) -> np.ndarray:
        import jax
        model, qmap = self._model, self._qmap
        logits = model.forward_logits(jnp.asarray(ids[None, :]),
                                      qmap=qmap)
        lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        return np.asarray(lp)

    def _loglikelihood(self, context: str, continuation: str):
        ctx = self._encode(context)
        cont = self._encode(continuation)
        ids = np.concatenate([ctx, cont])
        lp = self._logprobs(ids)
        tgt = ids[len(ctx):]
        pos = np.arange(len(ctx) - 1, len(ids) - 1)
        token_lp = lp[pos, tgt]
        greedy = lp[pos].argmax(-1)
        return float(token_lp.sum()), bool((greedy == tgt).all())

    def _rolling_ll(self, text: str):
        ids = self._encode(text)
        lp = self._logprobs(ids)
        token_lp = lp[np.arange(len(ids) - 1), ids[1:]]
        return float(token_lp.sum())

    def _generate(self, context: str, gen_kwargs: Dict):
        from ..serve.decode import greedy_generate
        ids = self._encode(context)[None, :]
        max_new = int(gen_kwargs.get('max_gen_toks', 128))
        out = greedy_generate(self._model, jnp.asarray(ids), max_new,
                              qmap=self._qmap)
        new = np.asarray(out)[0, ids.shape[1]:]
        text = self._model.tokenizer.decode(new)
        for stop in gen_kwargs.get('until', []):
            idx = text.find(stop)
            if idx >= 0:
                text = text[:idx]
        return text


def run_lm_eval(model, tasks: List[str], qmap=None, **kw) -> Dict:
    """lm-eval entry (scripts/run_lm_eval.sh analog)."""
    import lm_eval
    adapter = LMEvalAdapter(model, qmap=qmap)
    return lm_eval.simple_evaluate(model=adapter.lm, tasks=tasks, **kw)
