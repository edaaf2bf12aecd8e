"""Gemma2 graph parity vs HF transformers (torch oracle, generated
locally): sandwich norms, GeGLU-tanh, logit softcapping, (1+w) RMSNorm
convention, sqrt(D) embedding scale.  Reference: llmc/models/gemma2.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=128,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=16, sliding_window=64)


@pytest.fixture(scope='module')
def tiny_gemma2_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    tr = pytest.importorskip('transformers')
    if not hasattr(tr, 'Gemma2ForCausalLM'):
        pytest.skip('transformers without Gemma2')
    cfg = tr.Gemma2Config(tie_word_embeddings=True, attention_bias=False,
                          hidden_activation='gelu_pytorch_tanh', **TINY)
    torch.manual_seed(0)
    model = tr.Gemma2ForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_gemma2')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_forward_matches_hf(tiny_gemma2_dir):
    import torch
    path, hf_model = tiny_gemma2_dir
    from llmc_tpu.models.adapter import Gemma2Adapter
    ours = Gemma2Adapter.from_pretrained(path, dtype=jnp.float32)
    assert ours.cfg.sandwich_norms and ours.cfg.act_fn == 'gelu_tanh'
    assert ours.cfg.attn_logit_softcap == 50.0
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_layout_uses_pre_ffn_norm():
    from llmc_tpu.models.llama import LlamaConfig, llama_layout
    cfg = LlamaConfig(sandwich_norms=True)
    lay = llama_layout(cfg)
    gate_up = [s for s in lay.subsets if s.name == 'gate_up'][0]
    assert gate_up.prev_op == 'pre_feedforward_layernorm'
    assert 'post_feedforward_layernorm' in lay.layernorms


def test_awq_pipeline_on_gemma2():
    """AWQ scaling through the sandwich-norm layout must preserve the
    float forward (scale fold invariance) and run end to end."""
    from llmc_tpu.models.adapter import Gemma2Adapter
    from llmc_tpu.main import run_pipeline
    config = {
        'model': {'type': 'Gemma2',
                  'arch': dict(vocab_size=128, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=2,
                               num_key_value_heads=2, head_dim=16,
                               dtype='float32')},
        'calib': {'name': 'synthetic', 'n_samples': 2, 'bs': -1,
                  'seq_len': 16, 'seed': 0, 'vocab_size': 128,
                  'preproc': 'random_truncate_txt'},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 16},
                  'special': {'trans': True, 'trans_version': 'v2',
                              'weight_clip': False}},
        'eval': {},
    }
    res = run_pipeline(config)
    assert res['model'] is not None
