"""Parity for the generalized-graph families vs HF transformers (torch
oracles generated locally): StableLm (LayerNorm + partial rotary),
Falcon (parallel residual + MQA fused qkv), Phi (shared-LN parallel +
biased head), Starcoder/gpt_bigcode (learned positions + MQA), Bloom
(ALiBi + embedding LN + interleaved fused qkv).

Reference wrappers: llmc/models/{stablelm,falcon,phi,starcoder,bloom}.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')
tr = pytest.importorskip('transformers')


def _roundtrip(hf_model, tmp_path, adapter_cls, vocab=256, atol=5e-3):
    hf_model.eval()
    d = tmp_path
    hf_model.save_pretrained(d, safe_serialization=True)
    ours = adapter_cls.from_pretrained(str(d), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, vocab, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=atol)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99
    return ours


def test_stablelm_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    from llmc_tpu.models.adapter import StableLmAdapter
    ours = _roundtrip(tr.StableLmForCausalLM(cfg), tmp_path,
                      StableLmAdapter)
    assert ours.cfg.norm_type == 'ln' and ours.cfg.rotary_pct == 0.25


def test_falcon_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, tie_word_embeddings=True)
    from llmc_tpu.models.adapter import FalconAdapter
    ours = _roundtrip(tr.FalconForCausalLM(cfg), tmp_path, FalconAdapter)
    assert ours.cfg.parallel_residual and ours.cfg.shared_ln
    assert ours.cfg.num_key_value_heads == 1


def test_falcon_alibi_parity(tmp_path):
    torch.manual_seed(1)
    cfg = tr.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False,
        new_decoder_architecture=False, parallel_attn=False, bias=True,
        alibi=True, tie_word_embeddings=True)
    from llmc_tpu.models.adapter import FalconAdapter
    ours = _roundtrip(tr.FalconForCausalLM(cfg), tmp_path, FalconAdapter)
    assert ours.cfg.use_alibi and ours.cfg.rotary_pct == 0.0


def test_phi_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    from llmc_tpu.models.adapter import PhiAdapter
    ours = _roundtrip(tr.PhiForCausalLM(cfg), tmp_path, PhiAdapter)
    assert ours.cfg.parallel_residual and ours.cfg.shared_ln
    assert ours.params['lm_head']['b'] is not None


def test_starcoder_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=64, multi_query=True,
        activation_function='gelu_pytorch_tanh', tie_word_embeddings=True)
    from llmc_tpu.models.adapter import StarcoderAdapter
    ours = _roundtrip(tr.GPTBigCodeForCausalLM(cfg), tmp_path,
                      StarcoderAdapter)
    assert ours.cfg.learned_pos and ours.cfg.rotary_pct == 0.0


def test_bloom_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True)
    from llmc_tpu.models.adapter import BloomAdapter
    ours = _roundtrip(tr.BloomForCausalLM(cfg), tmp_path, BloomAdapter)
    assert ours.cfg.use_alibi
    assert 'embed_layernorm' in ours.params


def test_layout_non_gated_shared_ln():
    from llmc_tpu.models.llama import LlamaConfig, llama_layout
    cfg = LlamaConfig(parallel_residual=True, shared_ln=True,
                      gated_mlp=False, norm_type='ln')
    lay = llama_layout(cfg)
    names = {s.name: s for s in lay.subsets}
    assert names['gate_up'].layers == ('mlp.up_proj',)
    assert names['gate_up'].prev_op == 'input_layernorm'
    assert 'mlp.gate_proj' not in lay.linears
    assert lay.layernorms == ('input_layernorm',)


def test_internlm2_remap(tmp_path):
    """Build an InternLM2-named checkpoint from known llama params (wqkv
    grouped [KVH, rep+2, hd] rows); the adapter's split must reproduce
    the llama forward exactly."""
    import json
    import jax
    from safetensors.numpy import save_file
    from llmc_tpu.models import LlamaAdapter
    from llmc_tpu.models.adapter import InternLM2Adapter
    from llmc_tpu.models.llama import LlamaConfig, init_params
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8, dtype='float32')
    params = init_params(cfg, jax.random.PRNGKey(0))
    H, KVH, hd, D = 4, 2, 8, 32
    rep = H // KVH
    flat = {'model.tok_embeddings.weight':
            np.asarray(params['embed_tokens']['w']),
            'model.norm.weight': np.asarray(params['norm']['w']),
            'output.weight': np.asarray(params['lm_head']['w'])}
    for i, blk in enumerate(params['blocks']):
        b = f'model.layers.{i}'
        q = np.asarray(blk['self_attn']['q_proj']['w']).reshape(
            KVH, rep, hd, D)
        k = np.asarray(blk['self_attn']['k_proj']['w']).reshape(
            KVH, 1, hd, D)
        v = np.asarray(blk['self_attn']['v_proj']['w']).reshape(
            KVH, 1, hd, D)
        flat[f'{b}.attention.wqkv.weight'] = np.concatenate(
            [q, k, v], axis=1).reshape((rep + 2) * KVH * hd, D)
        flat[f'{b}.attention.wo.weight'] = np.asarray(
            blk['self_attn']['o_proj']['w'])
        flat[f'{b}.feed_forward.w1.weight'] = np.asarray(
            blk['mlp']['gate_proj']['w'])
        flat[f'{b}.feed_forward.w3.weight'] = np.asarray(
            blk['mlp']['up_proj']['w'])
        flat[f'{b}.feed_forward.w2.weight'] = np.asarray(
            blk['mlp']['down_proj']['w'])
        flat[f'{b}.attention_norm.weight'] = np.asarray(
            blk['input_layernorm']['w'])
        flat[f'{b}.ffn_norm.weight'] = np.asarray(
            blk['post_attention_layernorm']['w'])
    save_file(flat, str(tmp_path / 'model.safetensors'))
    (tmp_path / 'config.json').write_text(json.dumps(dict(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rms_norm_eps=1e-5,
        torch_dtype='float32')))
    ours = InternLM2Adapter.from_pretrained(str(tmp_path),
                                            dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 8)))
    ref = LlamaAdapter(cfg, params).forward_logits(ids)
    np.testing.assert_allclose(np.asarray(ours.forward_logits(ids)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_minicpm_scaling():
    """Neutral scaling knobs must reduce to the plain Llama forward; the
    adapter wires scale_emb / scale_depth / dim_model_base into
    embed_multiplier / residual_multiplier / logit_divisor."""
    import jax
    from llmc_tpu.models import LlamaAdapter
    from llmc_tpu.models.llama import LlamaConfig, init_params
    import dataclasses as dc
    base = LlamaConfig(vocab_size=128, hidden_size=32,
                       intermediate_size=64, num_hidden_layers=2,
                       num_attention_heads=2, num_key_value_heads=2,
                       head_dim=16, dtype='float32')
    params = init_params(base, jax.random.PRNGKey(0))
    neutral = dc.replace(base, embed_multiplier=1.0,
                         residual_multiplier=1.0, logit_divisor=1.0)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 8)))
    a = LlamaAdapter(base, params).forward_logits(ids)
    b = LlamaAdapter(neutral, params).forward_logits(ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    scaled = dc.replace(base, logit_divisor=4.0)
    c = LlamaAdapter(scaled, params).forward_logits(ids)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_gptq_pipeline_on_falcon_arch():
    """Blockwise engine + GPTQ over the parallel-residual shared-LN
    layout end to end (exercises capture + subset transform on the
    generalized graph)."""
    from llmc_tpu.main import run_pipeline
    config = {
        'model': {'type': 'Falcon',
                  'arch': dict(vocab_size=128, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=2, head_dim=16,
                               dtype='float32')},
        'calib': {'name': 'synthetic', 'n_samples': 2, 'bs': -1,
                  'seq_len': 16, 'seed': 0, 'vocab_size': 128,
                  'preproc': 'random_truncate_txt'},
        'quant': {'method': 'GPTQ',
                  'weight': {'bit': 4, 'symmetric': True,
                             'granularity': 'per_group',
                             'group_size': 16},
                  'special': {'actorder': True, 'percdamp': 0.01}},
        'eval': {},
    }
    res = run_pipeline(config)
    assert res['model'] is not None


def test_glm_parity(tmp_path):
    torch.manual_seed(0)
    cfg = tr.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, partial_rotary_factor=0.5,
        attention_bias=True, tie_word_embeddings=False, pad_token_id=0)
    from llmc_tpu.models.adapter import GlmAdapter
    ours = _roundtrip(tr.GlmForCausalLM(cfg), tmp_path, GlmAdapter)
    assert ours.cfg.rope_interleaved and ours.cfg.rotary_pct == 0.5
    assert 'gate_proj' in ours.params['blocks'][0]['mlp']
