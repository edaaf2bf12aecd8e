"""Round-3 config-corpus smoke tests (VERDICT r2 #10).

One end-to-end run per new config family: FP-quant e2m1/e5m2 W+A, the
REAL two-step quarot->gptq combination (save_trans -> reload -> GPTQ
with online_rotate through calibration, Hessians and deploy), and the
DeepSeek backend-export shape.  Mirrors the reference configs cited in
each section.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_tpu.main import run_pipeline

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16)


def _base_cfg(eval_pos):
    return {
        'base': {'seed': 7},
        'model': {'type': 'Llama', 'arch': dict(TINY, dtype='float32')},
        'eval': {'name': 'synthetic', 'num_tokens': 768, 'seq_len': 32,
                 'vocab_size': 128, 'bs': 2, 'eval_pos': list(eval_pos)},
    }


@pytest.mark.parametrize('fmt', ['e2m1', 'e5m2'])
def test_fp_quant_pipeline(fmt):
    """configs/quantization/methods/fp_quant_{e2m1,e5m2}.yml shape
    (reference FP_Quant rtn_we2m1ae2m1 / rtn_we5m2ae5m2)."""
    cfg = _base_cfg(['pretrain', 'fake_quant'])
    cfg['quant'] = {
        'method': 'RTN',
        'weight': {'quant_type': 'float-quant', 'bit': fmt,
                   'symmetric': True, 'granularity': 'per_channel'},
        'act': {'quant_type': 'float-quant', 'bit': fmt,
                'symmetric': True, 'granularity': 'per_token'},
    }
    res = run_pipeline(cfg)
    assert np.isfinite(res['ppl_fake_quant'])
    # e5m2 keeps 2 mantissa bits — should stay near pretrain; e2m1 is
    # FP4 and may drift but must not blow up on a tiny random model
    rel = abs(res['ppl_fake_quant'] - res['ppl_pretrain']) \
        / res['ppl_pretrain']
    assert rel < (0.05 if fmt == 'e5m2' else 0.5)


def test_quarot_gptq_two_step(tmp_path):
    """REAL 2-step: step-1 QuaRot (online_rotate) save_trans, step-2
    GPTQ loads the rotated checkpoint and quantizes with the online
    hadamard honored in calibration + deploy
    (configs/quantization/combination/step_{1_quarot,2_gptq}.yml)."""
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.models.llama import init_params

    # tiny checkpoint on disk for step 1
    ckpt = str(tmp_path / 'base')
    cfg_l = LlamaConfig(dtype='float32', **TINY)
    m = LlamaAdapter(cfg_l, init_params(cfg_l, jax.random.PRNGKey(0)))
    from llmc_tpu.models.hf_loader import save_llama_params_to_hf
    hf_cfg = dict(TINY, rms_norm_eps=1e-5, torch_dtype='float32',
                  rope_theta=10000.0, max_position_embeddings=256,
                  tie_word_embeddings=False)
    save_llama_params_to_hf(m.params, ckpt, hf_cfg)

    rotated = str(tmp_path / 'rotated')
    step1 = {
        'base': {'seed': 0},
        'model': {'type': 'Llama', 'path': ckpt,
                  'torch_dtype': 'float32'},
        'eval': {'name': 'synthetic', 'num_tokens': 768, 'seq_len': 32,
                 'vocab_size': 128, 'bs': 2,
                 'eval_pos': ['pretrain', 'transformed']},
        'quant': {'method': 'Quarot',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_channel'},
                  'special': {'rotate_mode': 'hadamard',
                              'fp32_had': True, 'online_rotate': True}},
        'save': {'save_trans': True, 'save_path': rotated},
    }
    r1 = run_pipeline(step1)
    # QuaRot's transformed model is equivalent only up to weight-BAKING
    # rounding (f32(W @ H) loses bits; the reference's own quarot runs
    # show the same deterministic pretrain/transformed drift, PARITY.md
    # QuaRot rows), so assert closeness, not equality.  The ONLINE
    # hadamard itself is exact: with pre_had entries mis-applied the
    # forward is garbage (orders of magnitude off), not percent-level.
    assert r1['ppl_transformed'] == pytest.approx(r1['ppl_pretrain'],
                                                  rel=0.02)
    assert os.path.exists(os.path.join(rotated, 'model.safetensors'))

    # save -> reload -> online-hadamard chain is EXACT: the reloaded
    # rotated checkpoint under the transform qmap reproduces the step-1
    # in-memory transformed model bit-for-bit (f32 safetensors roundtrip)
    m1, opt1 = r1['model'], r1['opt']
    m2 = LlamaAdapter.from_pretrained(rotated, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 16)))
    tmap = opt1.transform_qmap()
    assert tmap is not None
    np.testing.assert_allclose(
        np.asarray(m2.forward_logits(ids, qmap=tmap)),
        np.asarray(m1.forward_logits(ids, qmap=tmap)),
        rtol=1e-5, atol=1e-5)

    step2 = {
        'base': {'seed': 0},
        'model': {'type': 'Llama', 'path': rotated,
                  'torch_dtype': 'float32'},
        'calib': {'name': 'synthetic', 'n_samples': 4, 'bs': -1,
                  'seq_len': 24, 'seed': 0, 'vocab_size': 128,
                  'preproc': 'random_truncate_txt'},
        'eval': {'name': 'synthetic', 'num_tokens': 768, 'seq_len': 32,
                 'vocab_size': 128, 'bs': 2,
                 'eval_pos': ['fake_quant']},
        'quant': {'method': 'GPTQ',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 32, 'calib_algo': 'minmax'},
                  'special': {'actorder': True, 'percdamp': 0.01,
                              'blocksize': 32, 'true_sequential': False,
                              'online_rotate': True, 'fp32_had': True},
                  'quant_out': True},
    }
    r2 = run_pipeline(step2)
    assert np.isfinite(r2['ppl_fake_quant'])
    # 4-bit GPTQ on a hadamard-conditioned model shouldn't explode
    assert r2['ppl_fake_quant'] < r1['ppl_pretrain'] * 1.5


def test_dsv3_backend_export_shape(tmp_path):
    """configs/backend/vllm_dsv3_w4.yml shape: MoE model -> RTN W4
    need_pack -> save_vllm (reference rtn_w4a16_dsv3.yml)."""
    torch = pytest.importorskip('torch')
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    ds = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
              moe_intermediate_size=48, num_hidden_layers=2,
              num_attention_heads=4, q_lora_rank=32, kv_lora_rank=32,
              qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
              n_routed_experts=4, n_shared_experts=1,
              num_experts_per_tok=2, routed_scaling_factor=1.0,
              norm_topk_prob=False, first_k_dense_replace=1,
              moe_layer_freq=1, num_key_value_heads=4)
    torch.manual_seed(0)
    hf = DeepseekV2ForCausalLM(DeepseekV2Config(
        tie_word_embeddings=False, attention_bias=False, **ds))
    path = str(tmp_path / 'ds')
    hf.save_pretrained(path, safe_serialization=True)
    out = str(tmp_path / 'vllm_out')
    cfg = {
        'base': {'seed': 42},
        'model': {'type': 'DeepseekV2', 'path': path},
        'calib': {'name': 'synthetic', 'n_samples': 2, 'bs': -1,
                  'seq_len': 12, 'seed': 0, 'vocab_size': 128},
        'eval': {'name': 'synthetic', 'num_tokens': 256, 'seq_len': 16,
                 'vocab_size': 128, 'bs': 2, 'eval_pos': ['fake_quant']},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 4, 'symmetric': True,
                             'granularity': 'per_group',
                             'group_size': 16, 'need_pack': True}},
        'save': {'save_vllm': True, 'save_path': out},
    }
    res = run_pipeline(cfg)
    assert res['saved_to'] == out
    assert os.path.exists(os.path.join(out, 'model.safetensors'))
    with open(os.path.join(out, 'config.json')) as f:
        exported = json.load(f)
    assert 'quantization_config' in exported or 'compression_config' \
        in exported
