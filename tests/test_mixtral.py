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


def test_qwen2moe_hf_parity(tmp_path):
    """Qwen2-MoE with the SHARED expert + softmax-then-topk routing must
    match the HF oracle logit-for-logit."""
    import torch
    import transformers as tr
    cfg = tr.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, shared_expert_intermediate_size=160,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=False, decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = tr.Qwen2MoeForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from llmc_tpu.models.adapter import Qwen2MoeAdapter
    ours = Qwen2MoeAdapter.from_pretrained(str(tmp_path),
                                           dtype=jnp.float32)
    ids = np.random.RandomState(0).randint(0, 128, size=(2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_qwen2moe_pipeline_quantizes_shared_expert(tmp_path):
    """The shared expert's linears are in the layout and get quantized."""
    from llmc_tpu.models import qwen2moe as QM
    from llmc_tpu.models.adapter import Qwen2MoeAdapter
    from llmc_tpu.models.base import get_path
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    cfg = QM.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        shared_expert_intermediate_size=160, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, dtype='float32')
    model = Qwen2MoeAdapter.random(cfg, seed=3)
    layout = model.get_layout()
    assert 'mlp.shared_expert.down_proj' in layout.linears
    c = Cfg({'base': {'seed': 7},
             'quant': {'method': 'RTN',
                       'weight': {'bit': 4, 'symmetric': False,
                                  'granularity': 'per_group',
                                  'group_size': 16}}})
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 128, (2, 12)))
    xs, kws = model.collect_first_block_input([{'input_ids': ids}])
    algo = ALGO_REGISTRY['RTN'](model, c['quant'],
                                {'data': xs, 'kwargs': kws}, None, c)
    algo.run_block_loop()
    w0 = np.asarray(get_path(model.blocks[0],
                             'mlp.shared_expert.down_proj')['w']).copy()
    algo.deploy('fake_quant')
    algo.bake_fake_quant_weights()
    w1 = np.asarray(get_path(model.blocks[0],
                             'mlp.shared_expert.down_proj')['w'])
    assert np.abs(w1 - w0).max() > 0  # actually quantized
