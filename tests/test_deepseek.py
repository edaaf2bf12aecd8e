"""DeepSeek-V2 (MLA + MoE) parity vs HF + quant pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

DS_TINY = dict(vocab_size=128, hidden_size=64,
               intermediate_size=96, moe_intermediate_size=48,
               num_hidden_layers=3, num_attention_heads=4,
               q_lora_rank=32, kv_lora_rank=32,
               qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
               n_routed_experts=4, n_shared_experts=1,
               num_experts_per_tok=2, routed_scaling_factor=1.0,
               norm_topk_prob=False, first_k_dense_replace=1,
               moe_layer_freq=1, num_key_value_heads=4)


@pytest.fixture(scope='module')
def tiny_ds_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    cfg = DeepseekV2Config(tie_word_embeddings=False, attention_bias=False,
                           **DS_TINY)
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_ds')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_deepseek_forward_matches_hf(tiny_ds_dir):
    import torch
    path, hf_model = tiny_ds_dir
    from llmc_tpu.models.adapter import DeepseekV2Adapter
    ours = DeepseekV2Adapter.from_pretrained(path, dtype=jnp.float32)
    assert ours.cfg.q_lora_rank == 32
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(1, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=6e-3, atol=6e-3)


def test_deepseek_rtn_pipeline(tiny_ds_dir):
    path, _ = tiny_ds_dir
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 1},
        'model': {'type': 'DeepseekV2', 'path': path},
        'calib': {'name': 'synthetic', 'n_samples': 2, 'bs': -1,
                  'seq_len': 12, 'seed': 0, 'vocab_size': 128},
        'eval': {'name': 'synthetic', 'num_tokens': 384, 'seq_len': 24,
                 'vocab_size': 128, 'bs': 2,
                 'eval_pos': ['pretrain', 'transformed', 'fake_quant']},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'}},
    }
    res = run_pipeline(cfg)
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-6)
    assert np.isfinite(res['ppl_fake_quant'])


def test_mla_latent_cache_decode_matches_full(tiny_ds_dir):
    """Absorbed-MLA decode (serve/mla_decode.py): the latent cache path
    must reproduce the full forward for whole-sequence prefill and for
    token-by-token decode (cache stores dc+dr floats/token, not H
    per-head K/V)."""
    path, _ = tiny_ds_dir
    from llmc_tpu.models.adapter import DeepseekV2Adapter
    from llmc_tpu.serve import init_mla_cache, mla_forward_cached
    ours = DeepseekV2Adapter.from_pretrained(path, dtype=jnp.float32)
    cfg = ours.cfg
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (1, 10)))
    full = np.asarray(ours.forward_logits(ids))
    cache = init_mla_cache(cfg, 1, 10, dtype=jnp.float32)
    got, _ = mla_forward_cached(ours.params, cfg, ids, cache)
    np.testing.assert_allclose(np.asarray(got), full, rtol=2e-4,
                               atol=2e-4)
    cache = init_mla_cache(cfg, 1, 10, dtype=jnp.float32)
    _, cache = mla_forward_cached(ours.params, cfg, ids[:, :6], cache)
    last = None
    for t in range(6, 10):
        last, cache = mla_forward_cached(ours.params, cfg,
                                         ids[:, t:t + 1], cache)
    np.testing.assert_allclose(np.asarray(last[:, -1]), full[:, -1],
                               rtol=2e-4, atol=2e-4)
    assert cache['ckv'].shape == (3, 1, 10, cfg.kv_lora_rank)


def test_mla_greedy_generate(tiny_ds_dir):
    path, _ = tiny_ds_dir
    from llmc_tpu.models.adapter import DeepseekV2Adapter
    from llmc_tpu.serve import mla_greedy_generate
    ours = DeepseekV2Adapter.from_pretrained(path, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (2, 5)))
    out = mla_greedy_generate(ours, ids, max_new_tokens=4)
    assert out.shape == (2, 9)
    full = np.asarray(ours.forward_logits(out[:, :8]))
    np.testing.assert_array_equal(np.argmax(full[:, -1], -1),
                                  np.asarray(out)[:, 8])
