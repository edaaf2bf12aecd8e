"""Cached decode vs full forward across the generalized graph: the
serving path (_block_cached) must reproduce model_apply for every
architecture family knob — sandwich norms + softcaps (Gemma2),
interleaved rope (GLM), parallel residual + alibi (Falcon/Bloom),
LayerNorm + partial rotary (StableLm/Phi), learned positions
(Starcoder), depth scaling (MiniCPM), sliding window."""

import numpy as np
import pytest

import jax.numpy as jnp

ARCHS = {
    'llama': {},
    'gemma2': dict(act_fn='gelu_tanh', sandwich_norms=True,
                   embed_scale=True, tie_word_embeddings=True,
                   attn_logit_softcap=50.0, final_logit_softcap=30.0,
                   query_pre_attn_scalar=16.0, sliding_window=6),
    'glm': dict(rotary_pct=0.5, rope_interleaved=True,
                attention_bias=True),
    'falcon': dict(norm_type='ln', parallel_residual=True, shared_ln=True,
                   gated_mlp=False, act_fn='gelu', num_key_value_heads=1,
                   tie_word_embeddings=True),
    'bloom': dict(norm_type='ln', gated_mlp=False, act_fn='gelu_tanh',
                  rotary_pct=0.0, use_alibi=True,
                  tie_word_embeddings=True),
    'falcon_alibi': dict(norm_type='ln', gated_mlp=False, act_fn='gelu',
                         rotary_pct=0.0, use_alibi=True,
                         alibi_scaled=True),
    'stablelm': dict(norm_type='ln', rotary_pct=0.25,
                     attention_bias=True),
    'starcoder': dict(norm_type='ln', gated_mlp=False,
                      act_fn='gelu_tanh', rotary_pct=0.0,
                      learned_pos=True, num_key_value_heads=1,
                      tie_word_embeddings=True),
    'minicpm': dict(embed_multiplier=2.0, residual_multiplier=0.7,
                    logit_divisor=2.0),
}


@pytest.mark.parametrize('name', sorted(ARCHS))
def test_cached_decode_matches_full(name):
    import jax
    from llmc_tpu.models import LlamaAdapter
    from llmc_tpu.models.llama import LlamaConfig, init_params
    from llmc_tpu.serve.decode import forward_cached, init_cache
    from llmc_tpu.serve.kvcache import KVCachePolicy
    arch = dict(vocab_size=96, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, dtype='float32',
                max_position_embeddings=64)
    arch.update(ARCHS[name])
    cfg = LlamaConfig(**arch)
    m = LlamaAdapter(cfg, init_params(cfg, jax.random.PRNGKey(0)))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 96, (1, 10)))
    full = np.asarray(m.forward_logits(ids))
    policy = KVCachePolicy(method='fp')

    # (a) prefill of the whole sequence at once
    cache = init_cache(m, 1, 10, policy)
    got, _ = forward_cached(m.params, cfg, ids, cache, policy)
    np.testing.assert_allclose(np.asarray(got), full, rtol=2e-4,
                               atol=2e-4, err_msg=f'{name}: prefill')

    # (b) prefill 5 + five single-token decode steps
    cache = init_cache(m, 1, 10, policy)
    _, cache = forward_cached(m.params, cfg, ids[:, :5], cache, policy)
    last = None
    for t in range(5, 10):
        last, cache = forward_cached(m.params, cfg, ids[:, t:t + 1],
                                     cache, policy)
    np.testing.assert_allclose(np.asarray(last[:, -1]), full[:, -1],
                               rtol=2e-4, atol=2e-4,
                               err_msg=f'{name}: decode')
