"""HumanEval code generation eval.

Reference: /root/reference/llmc/eval/eval_code.py:13-149 (generates
completions for the HumanEval problems and scores pass@k via the
``human_eval`` package).  The package is optional here (not in the
image); generation runs natively through the serving path and problems
can also be supplied as a JSONL file.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class HumanEval:
    def __init__(self, problem_file: Optional[str] = None,
                 max_new_tokens: int = 256, n_samples_per_task: int = 1,
                 res_path: str = './humaneval_out'):
        self.problem_file = problem_file
        self.max_new_tokens = max_new_tokens
        self.n_samples = n_samples_per_task
        self.res_path = res_path

    def _load_problems(self) -> Dict[str, Dict]:
        if self.problem_file and os.path.exists(self.problem_file):
            problems = {}
            with open(self.problem_file) as f:
                for line in f:
                    if line.strip():
                        p = json.loads(line)
                        problems[p['task_id']] = p
            return problems
        from human_eval.data import read_problems  # optional dep
        return read_problems()

    @staticmethod
    def _truncate(completion: str) -> str:
        """Cut at the first top-level statement after the function body
        (eval_code.py stop-sequence handling)."""
        for stop in ('\ndef ', '\nclass ', '\nif __name__',
                     '\nprint(', '\n#'):
            idx = completion.find(stop)
            if idx >= 0:
                completion = completion[:idx]
        return completion

    def eval(self, model, qmap=None) -> Dict:
        from ..serve.decode import greedy_generate
        problems = self._load_problems()
        tok = model.tokenizer
        samples: List[Dict] = []
        for task_id, prob in problems.items():
            prompt = prob['prompt']
            ids = np.asarray(tok(prompt)['input_ids'], np.int32)[None, :]
            out = greedy_generate(model, jnp.asarray(ids),
                                  self.max_new_tokens, qmap=qmap)
            new = np.asarray(out)[0, ids.shape[1]:]
            completion = self._truncate(tok.decode(
                new, skip_special_tokens=True))
            samples.append({'task_id': task_id,
                            'completion': completion})
        os.makedirs(self.res_path, exist_ok=True)
        sample_file = os.path.join(self.res_path, 'samples.jsonl')
        with open(sample_file, 'w') as f:
            for s in samples:
                f.write(json.dumps(s) + '\n')
        try:
            from human_eval.evaluation import evaluate_functional_correctness
            results = evaluate_functional_correctness(sample_file)
            return results
        except ImportError:
            return {'samples': sample_file,
                    'note': 'human_eval package not installed; '
                            'completions written for offline scoring'}
