"""Mixtral MoE parity vs HF + per-expert quantization pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

MX_TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16,
               num_local_experts=4, num_experts_per_tok=2)


@pytest.fixture(scope='module')
def tiny_mixtral_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from transformers import MixtralConfig as HFConfig
    from transformers import MixtralForCausalLM
    cfg = HFConfig(tie_word_embeddings=False, **MX_TINY)
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_mixtral')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_mixtral_forward_matches_hf(tiny_mixtral_dir):
    import torch
    path, hf_model = tiny_mixtral_dir
    from llmc_tpu.models.adapter import MixtralAdapter
    ours = MixtralAdapter.from_pretrained(path, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(1, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_mixtral_per_expert_quant_pipeline(tiny_mixtral_dir):
    path, _ = tiny_mixtral_dir
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 1},
        'model': {'type': 'Mixtral', 'path': path},
        'calib': {'name': 'synthetic', 'n_samples': 2, 'bs': -1,
                  'seq_len': 16, 'seed': 0, 'vocab_size': 128},
        'eval': {'name': 'synthetic', 'num_tokens': 512, 'seq_len': 32,
                 'vocab_size': 128, 'bs': 2,
                 'eval_pos': ['pretrain', 'transformed', 'fake_quant']},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 32},
                  'special': {'trans': True, 'weight_clip': False}},
    }
    res = run_pipeline(cfg)
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=2e-3)
    assert np.isfinite(res['ppl_fake_quant'])
