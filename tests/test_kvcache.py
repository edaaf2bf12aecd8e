"""KV-cache policy tests: Naive int8/int4, KIVI residual, SinkKV window."""

import numpy as np
import pytest

import jax.numpy as jnp

from llmc_tpu.models import LlamaAdapter, LlamaConfig
from llmc_tpu.serve.decode import decode_nll, greedy_generate
from llmc_tpu.serve.kvcache import KVCachePolicy

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16)


@pytest.fixture(scope='module')
def model():
    return LlamaAdapter.random(LlamaConfig(**TINY, dtype='float32'),
                               seed=11)


@pytest.fixture(scope='module')
def ids():
    return jnp.asarray(np.random.RandomState(7).randint(0, 128, (1, 24)))


def _ppl(nll, n):
    return float(np.exp(float(nll) / n))


def test_naive_int4_worse_than_int8(model, ids):
    fp, n = decode_nll(model, ids)
    q8, _ = decode_nll(model, ids,
                       kv_policy=KVCachePolicy(method='naive', bit=8))
    q4, _ = decode_nll(model, ids,
                       kv_policy=KVCachePolicy(method='naive', bit=4))
    assert abs(_ppl(q8, n) - _ppl(fp, n)) < abs(_ppl(q4, n) - _ppl(fp, n)) \
        + 0.5
    assert np.isfinite(_ppl(q4, n))


def test_naive_asymmetric(model, ids):
    fp, n = decode_nll(model, ids)
    qa, _ = decode_nll(model, ids,
                       kv_policy=KVCachePolicy(method='naive', bit=8,
                                               symmetric=False))
    assert abs(_ppl(qa, n) - _ppl(fp, n)) / _ppl(fp, n) < 0.05


def test_kivi_residual_recovers_accuracy(model, ids):
    fp, n = decode_nll(model, ids)
    kivi, _ = decode_nll(model, ids,
                         kv_policy=KVCachePolicy(method='kivi', bit=4,
                                                 residual_length=8))
    q4, _ = decode_nll(model, ids,
                       kv_policy=KVCachePolicy(method='naive', bit=4))
    # FP residual window should not be (much) worse than full int4
    assert _ppl(kivi, n) < _ppl(q4, n) * 1.25


def test_sink_window_generates(model):
    prompt = jnp.asarray(np.random.RandomState(9).randint(0, 128, (1, 6)))
    pol = KVCachePolicy(method='sink', num_sink_tokens=2, window_length=8)
    out = greedy_generate(model, prompt, max_new_tokens=12, kv_policy=pol)
    assert out.shape == (1, 18)
    assert np.isfinite(np.asarray(out)).all()


def test_sink_mask_shape():
    pol = KVCachePolicy(method='sink', num_sink_tokens=2, window_length=4)
    m = np.asarray(pol.attention_mask_offset(jnp.asarray(10), 16))
    assert m[:2].all()            # sinks always valid
    assert m[6:10].all()          # recent window valid
    assert not m[2:6].any()       # evicted middle
