"""K-step decode windows (`decode_steps_per_sync`): one device program
emits K tokens per slot per host round-trip.  Tokens must be
BIT-IDENTICAL to the single-step engine — the window splits the PRNG
key per scan step exactly as the single-step path splits per call.

No reference counterpart (llmc has no serving runtime, SURVEY.md §2.14);
this guards the r5 dispatch-amortization optimization (VERDICT r4 #2).
"""

import numpy as np
import pytest

from llmc_tpu.models import LlamaAdapter, LlamaConfig
from llmc_tpu.serve.engine import Request, ServingEngine
from llmc_tpu.serve.kvcache import KVCachePolicy

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16)


def _reqs(n=3, seed=5, max_new=10, eos=None):
    rng = np.random.RandomState(seed)
    return [Request(uid=i, prompt_ids=rng.randint(0, 128, (4 + i,)),
                    max_new_tokens=max_new, eos_id=eos)
            for i in range(n)]


def _run(model, K, *, temperature=0.0, kv=None, eos=None, max_new=10,
         n=3):
    eng = ServingEngine(model, max_batch=2, max_len=64,
                        prefill_buckets=(8, 16), seed=11,
                        temperature=temperature, top_p=0.9,
                        kv_policy=kv or KVCachePolicy(method='fp'),
                        decode_steps_per_sync=K)
    reqs = _reqs(n=n, max_new=max_new, eos=eos)
    eng.run(reqs)
    assert all(r.done for r in reqs)
    return [list(r.output_ids) for r in reqs]


@pytest.fixture(scope='module')
def model():
    cfg = LlamaConfig(**TINY, dtype='float32')
    return LlamaAdapter.random(cfg, seed=4)


def test_window_matches_single_step_greedy(model):
    assert _run(model, 4) == _run(model, 1)


def test_window_matches_single_step_sampled(model):
    """temperature>0: the per-step key-split sequence must line up."""
    assert _run(model, 4, temperature=0.8) == \
        _run(model, 1, temperature=0.8)


def test_window_matches_single_step_int8kv(model):
    kv = KVCachePolicy(method='naive', bit=8)
    assert _run(model, 8, kv=kv) == _run(model, 1, kv=kv)


def test_window_eos_trims_overshoot(model):
    """A mid-window EOS must retire the request with the overshoot
    trimmed: outputs equal the single-step engine's exactly."""
    # pick an eos id that actually occurs: take it from a greedy run
    base = _run(model, 1, max_new=10)
    eos = base[0][3]                  # forces slot 0 to stop at step 4
    a = _run(model, 4, eos=eos)
    b = _run(model, 1, eos=eos)
    assert a == b
    assert all(len(o) <= 10 for o in a)


def test_window_max_len_headroom(model):
    """Windows near max_len fall back to single steps instead of
    writing past the cache (max_new large enough to hit S-1)."""
    eng = ServingEngine(model, max_batch=2, max_len=24,
                        prefill_buckets=(8, 16),
                        decode_steps_per_sync=4)
    reqs = _reqs(n=2, max_new=64)
    eng.run(reqs)
    assert all(r.done for r in reqs)
    eng1 = ServingEngine(model, max_batch=2, max_len=24,
                         prefill_buckets=(8, 16))
    reqs1 = _reqs(n=2, max_new=64)
    eng1.run(reqs1)
    assert [r.output_ids for r in reqs] == [r.output_ids for r in reqs1]
