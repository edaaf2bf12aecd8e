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


def test_kivi_splice_exact_alignment():
    """Positions [total-R, total) must read back EXACTLY FP (including the
    just-written tokens, before pos advances); older positions must equal
    their per-token quant-dequant values.  Catches off-by-one splices."""
    R, B, KH, hd, T = 4, 1, 2, 8, 10
    pol = KVCachePolicy(method='kivi', bit=4, residual_length=R)
    cache = pol.init_cache(B, T, KH, hd, n_blocks=1, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    ks = rng.randn(T, B, 1, KH, hd).astype(np.float32)
    vs = rng.randn(T, B, 1, KH, hd).astype(np.float32)
    for t in range(T):
        cache = pol.update(cache, 0, jnp.asarray(ks[t]), jnp.asarray(vs[t]))
        k_read, v_read = pol.read(cache, 0, jnp.float32)
        total = t + 1
        for a in range(total):
            got = np.asarray(k_read[0, a])
            fp = ks[a, 0, 0]
            if a >= total - R:          # residual window: exact FP
                np.testing.assert_allclose(got, fp, rtol=0, atol=0,
                                           err_msg=f't={t} pos={a} (FP)')
            else:                       # evicted: quant-dequant
                q, s, _ = pol._quant(jnp.asarray(fp[None, None, None]))
                exp = np.asarray(pol._dequant(q, s, None, jnp.float32))[0, 0, 0]
                np.testing.assert_allclose(got, exp, rtol=0, atol=0,
                                           err_msg=f't={t} pos={a} (Q)')
        cache = dict(cache, pos=cache['pos'] + 1)


def test_kivi_beats_naive_strictly(model, ids):
    fp, n = decode_nll(model, ids)
    kivi, _ = decode_nll(model, ids,
                         kv_policy=KVCachePolicy(method='kivi', bit=4,
                                                 residual_length=8))
    q4, _ = decode_nll(model, ids,
                       kv_policy=KVCachePolicy(method='naive', bit=4))
    # with a correct FP residual window the PPL gap to FP must shrink
    assert abs(_ppl(kivi, n) - _ppl(fp, n)) <= \
        abs(_ppl(q4, n) - _ppl(fp, n)) + 1e-6


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


@pytest.mark.parametrize('policy_kw', [
    dict(method='fp'),
    dict(method='naive', bit=8),
    dict(method='naive', bit=8, symmetric=False),
    dict(method='naive', bit=4),
])
def test_chunked_decode_matches_full_read(model, ids, policy_kw):
    """The chunked valid-length decode attention must reproduce the
    full-buffer masked attention (same cache contents, online softmax)."""
    from llmc_tpu.serve import decode as D
    pol = KVCachePolicy(**policy_kw)
    old = D.CHUNKED_DECODE
    try:
        D.CHUNKED_DECODE = True
        nll_c, n = decode_nll(model, ids, kv_policy=pol)
        D.CHUNKED_DECODE = False
        nll_f, _ = decode_nll(model, ids, kv_policy=pol)
    finally:
        D.CHUNKED_DECODE = old
    np.testing.assert_allclose(float(nll_c), float(nll_f), rtol=2e-4,
                               err_msg=str(policy_kw))


def test_chunked_decode_gqa_generate(model):
    """GQA grouping in the chunked path: greedy tokens must match the
    full-read path exactly."""
    from llmc_tpu.serve import decode as D
    prompt = jnp.asarray(np.random.RandomState(5).randint(0, 128, (2, 8)))
    old = D.CHUNKED_DECODE
    try:
        D.CHUNKED_DECODE = True
        out_c = np.asarray(greedy_generate(model, prompt, 24))
        D.CHUNKED_DECODE = False
        out_f = np.asarray(greedy_generate(model, prompt, 24))
    finally:
        D.CHUNKED_DECODE = old
    np.testing.assert_array_equal(out_c, out_f)


def test_naive_kv_parity_vs_reference():
    """Prefill quantization parity vs the reference NaiveQuantKVCache
    (kvquant.py:11-186): per-token int8/int4 sym/asym qparams must give
    the same dequantized K/V (the reference is the oracle; layouts are
    [B, H, S, hd] there vs [B, S, KVH, hd] here)."""
    import pytest
    from tests.ref_oracle import load_ref_module, reference_available
    if not reference_available():
        pytest.skip('reference tree unavailable')
    torch = pytest.importorskip('torch')
    kvq = load_ref_module('llmc.compression.quantization.kvquant')
    from llmc_tpu.serve.kvcache import KVCachePolicy

    rng = np.random.RandomState(0)
    B, H, S, hd = 1, 2, 6, 8
    k = rng.randn(B, H, S, hd).astype(np.float32) * 3
    v = rng.randn(B, H, S, hd).astype(np.float32)

    class _Cfg(dict):
        __getattr__ = dict.get

    for bit, sym in ((8, True), (8, False), (4, True), (4, False)):
        cfg = _Cfg(bit=bit, symmetric=sym, granularity='per_token')
        ref = kvq.NaiveQuantKVCache('int-quant', cfg, num_hidden_layers=1)
        ref._seen_tokens = 0  # newer transformers DynamicCache lacks it
        rk, rv = ref.update(torch.from_numpy(k), torch.from_numpy(v), 0,
                            {})
        # prefill path returns the DEQUANTIZED cache
        pol = KVCachePolicy(method='naive', bit=bit, symmetric=sym)
        cache = pol.init_cache(B, S, H, hd, 1, dtype=jnp.float32)
        cache = pol.update(cache, 0,
                           jnp.asarray(k.transpose(0, 2, 1, 3)),
                           jnp.asarray(v.transpose(0, 2, 1, 3)))
        ours_k, ours_v = pol.read(cache, 0, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ours_k).transpose(0, 2, 1, 3), rk.numpy(),
            atol=1e-5, rtol=1e-4, err_msg=f'K bit={bit} sym={sym}')
        np.testing.assert_allclose(
            np.asarray(ours_v).transpose(0, 2, 1, 3), rv.numpy(),
            atol=1e-5, rtol=1e-4, err_msg=f'V bit={bit} sym={sym}')
