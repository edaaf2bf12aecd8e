"""OPT parity vs HF + export-format tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

OPT_TINY = dict(vocab_size=256, hidden_size=64, ffn_dim=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=64)


@pytest.fixture(scope='module')
def tiny_opt_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from transformers import OPTConfig, OPTForCausalLM
    cfg = OPTConfig(word_embed_proj_dim=64, do_layer_norm_before=True,
                    **OPT_TINY)
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_opt')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_opt_forward_matches_hf(tiny_opt_dir):
    import torch
    path, hf_model = tiny_opt_dir
    from llmc_tpu.models.adapter import OptAdapter
    ours = OptAdapter.from_pretrained(path)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_opt_awq_pipeline(tiny_opt_dir):
    path, _ = tiny_opt_dir
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 1},
        'model': {'type': 'Opt', 'path': path},
        'calib': {'name': 'synthetic', 'n_samples': 4, 'bs': -1,
                  'seq_len': 16, 'seed': 0, 'vocab_size': 256},
        'eval': {'name': 'synthetic', 'num_tokens': 1024, 'seq_len': 32,
                 'vocab_size': 256, 'bs': 2,
                 'eval_pos': ['pretrain', 'transformed', 'fake_quant']},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32},
                  'special': {'trans': True, 'trans_version': 'v2',
                              'weight_clip': False}},
    }
    res = run_pipeline(cfg)
    # OPT has biases; scale_ln_fcs must preserve FP function
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=2e-3)
    assert np.isfinite(res['ppl_fake_quant'])


def test_vllm_pack_roundtrip():
    from llmc_tpu.export.formats import pack_int32_rows
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 16, size=(8, 64)).astype(np.uint8)
    packed = pack_int32_rows(codes, 4)
    assert packed.shape == (8, 8) and packed.dtype == np.int32
    u = packed.view(np.uint32)
    rec = np.zeros_like(codes)
    for i in range(8):
        rec[:, i::8] = (u >> (4 * i)) & 0xF
    np.testing.assert_array_equal(rec, codes)


def test_awq_gemm_pack_layout():
    from llmc_tpu.export.formats import AWQ_ORDER, export_awq_gemm_linear
    rng = np.random.RandomState(1)
    oc, ic, gs = 16, 32, 16
    codes = rng.randint(0, 16, size=(oc, ic)).astype(np.uint8)
    scales = rng.rand(oc, ic // gs).astype(np.float32)
    zeros = rng.randint(0, 16, size=(oc, ic // gs)).astype(np.float32)
    out = export_awq_gemm_linear(codes, scales, zeros, 4, gs)
    assert out['qweight'].shape == (ic, oc // 8)
    assert out['qzeros'].shape == (ic // gs, oc // 8)
    assert out['scales'].shape == (ic // gs, oc)
    # unpack qweight and verify AWQ order
    u = out['qweight'].view(np.uint32)
    rec = np.zeros((ic, oc), np.uint8)
    for i in range(8):
        rec[:, AWQ_ORDER[i]::8] = ((u >> (4 * i)) & 0xF).astype(np.uint8)
    np.testing.assert_array_equal(rec, codes.T)


def test_export_vllm_checkpoint(tmp_path):
    from llmc_tpu.export import export_real_quant
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg)
    m.hf_config = {'model_type': 'llama', 'num_hidden_layers': 1}
    wspec = QuantSpec(bit=4, symmetric=False, granularity='per_group',
                      group_size=16)
    qcfg = {'weight': {'bit': 4, 'symmetric': False,
                       'granularity': 'per_group', 'group_size': 16,
                       'need_pack': True}}
    out = str(tmp_path / 'vllm_ckpt')
    export_real_quant(m, wspec, qcfg, out, backend='vllm')
    assert os.path.exists(os.path.join(out, 'model.safetensors'))
    with open(os.path.join(out, 'config.json')) as f:
        c = json.load(f)
    assert c['compression_config']['format'] == 'pack-quantized'
    from safetensors.numpy import load_file
    flat = load_file(os.path.join(out, 'model.safetensors'))
    assert 'model.layers.0.self_attn.q_proj.weight_packed' in flat
    assert flat['model.layers.0.self_attn.q_proj.weight_scale'].dtype \
        == np.float16


def test_trtllm_checkpoint_export(tmp_path):
    """TRT-LLM checkpoint writer: config + per-rank safetensors with the
    transformer.* naming, fused TP-sharded qkv, W4A16 packing whose
    dequantized values reproduce per-channel symmetric int4 RTN."""
    import json
    import jax
    import numpy as np
    from safetensors.numpy import load_file
    from llmc_tpu.export.trtllm import export_trtllm
    from llmc_tpu.models import LlamaAdapter
    from llmc_tpu.models.llama import LlamaConfig, init_params
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8, dtype='float32')
    model = LlamaAdapter(cfg, init_params(cfg, jax.random.PRNGKey(0)))
    out = str(tmp_path / 'trt')
    export_trtllm(model, out, tp_size=2, pp_size=1, quant_algo='W4A16')
    config = json.load(open(out + '/config.json'))
    assert config['mapping'] == {'world_size': 2, 'tp_size': 2,
                                 'pp_size': 1}
    assert config['quantization']['quant_algo'] == 'W4A16'
    r0 = load_file(out + '/rank0.safetensors')
    r1 = load_file(out + '/rank1.safetensors')
    # fused qkv col-shard: (H/2 + 2*KVH/2) * hd rows = (2+2)*8 = 32
    qkv = r0['transformer.layers.0.attention.qkv.weight']
    assert qkv.dtype == np.int8 and qkv.shape == (32, 32 // 2)  # [in,out/2]
    sc = r0['transformer.layers.0.attention.qkv.per_channel_scale']
    assert sc.shape == (32,)
    # unpack + dequant == int4 per-channel RTN of the sharded fp weight
    lo = (qkv.astype(np.int8) << 4) >> 4   # sign-extend low nibble
    hi = qkv.astype(np.int8) >> 4
    codes = np.empty((qkv.shape[0], 32), np.int8)
    codes[:, 0::2] = lo
    codes[:, 1::2] = hi
    a = model.params['blocks'][0]['self_attn']
    H, KVH, hd = 4, 2, 8
    q = np.asarray(a['q_proj']['w']).reshape(H, hd, -1)[:2].reshape(16, -1)
    k = np.asarray(a['k_proj']['w']).reshape(KVH, hd, -1)[:1].reshape(8, -1)
    v = np.asarray(a['v_proj']['w']).reshape(KVH, hd, -1)[:1].reshape(8, -1)
    w = np.concatenate([q, k, v], 0)
    import jax.numpy as jnp
    from llmc_tpu.quant.qspec import QuantSpec
    from llmc_tpu.quant.quantizer import real_quant_weight
    exp_codes, exp_sc, _ = real_quant_weight(
        QuantSpec(bit=4, symmetric=True, granularity='per_channel'),
        jnp.asarray(w))
    np.testing.assert_array_equal(codes.T, np.asarray(exp_codes))
    np.testing.assert_allclose(sc, np.asarray(exp_sc).ravel(), rtol=1e-3)
    # lm_head excluded from quantization, vocab-sharded fp16
    assert r0['lm_head.weight'].dtype == np.float16
    assert r0['lm_head.weight'].shape == (32, 32)
    assert 'transformer.vocab_embedding.weight' in r1


def test_export_uses_stored_gptq_qparams(tmp_path):
    """A linear carrying gptq_scales must export codes computed with the
    loop's static qparams (dequant == static_w_qdq), not fresh dynamic
    minmax — and actorder must emit weight_g_idx mapping each original
    column to its permuted-layout group."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file
    from llmc_tpu.export import export_real_quant
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.models.base import get_path, set_path
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    from test_pipeline import tiny_config

    for actorder in (False, True):
        cfg = Cfg(tiny_config('GPTQ', wbit=4,
                              special={'actorder': actorder}))
        from llmc_tpu.models import build_model
        m = build_model(cfg)
        algo = ALGO_REGISTRY['GPTQ'](m, cfg['quant'],
                                     {'data': [], 'kwargs': []}, None, cfg)
        rng = np.random.RandomState(0)
        layout = m.get_layout()
        # run the real layer_transform on every linear of block 0
        blk = m.blocks[0]
        for path in layout.linears:
            lin = get_path(blk, path)
            C = lin['w'].shape[1]
            X = (rng.randn(64, C) * (1 + rng.rand(C))).astype(np.float32)
            H = algo._hessian([jnp.asarray(X)])
            blk = set_path(blk, path, algo.layer_transform(lin, H))
        m.set_block(0, blk)
        m.hf_config = {'model_type': 'llama', 'num_hidden_layers': 1}
        wspec = algo.wspec
        qcfg = {'weight': {'bit': 4, 'symmetric': False,
                           'granularity': 'per_group', 'group_size': 32}}
        out = str(tmp_path / f'gptq_ckpt_{actorder}')
        export_real_quant(m, wspec, qcfg, out, backend='vllm')
        flat = load_file(os.path.join(out, 'model.safetensors'))
        for path in layout.linears:
            lin = get_path(m.blocks[0], path)
            pfx = f'model.layers.0.{path}'
            codes = flat[f'{pfx}.weight'].astype(np.float32)
            scales = flat[f'{pfx}.weight_scale'].astype(np.float32)
            zeros = flat[f'{pfx}.weight_zero_point'].astype(np.float32)
            gs = 32
            if actorder:
                assert f'{pfx}.weight_g_idx' in flat
                g = flat[f'{pfx}.weight_g_idx']
            else:
                g = np.arange(codes.shape[1]) // gs
            deq = (codes - zeros[:, g]) * scales[:, g]
            expect = np.asarray(algo.static_w_qdq(lin), np.float32)
            # weight_scale is stored fp16 (format convention): allow the
            # resulting half-precision wobble
            np.testing.assert_allclose(deq, expect, rtol=2e-3, atol=2e-3)


def test_opt_generalized_cached_decode(tiny_opt_dir):
    """OPT rides the generalized cached-decode path (opt.to_generalized):
    greedy generation through the KV cache must match step-by-step
    argmax through OPT's own full forward."""
    path, _ = tiny_opt_dir
    from llmc_tpu.models.adapter import OptAdapter
    from llmc_tpu.serve.decode import greedy_generate
    m = OptAdapter.from_pretrained(path)
    g = m.as_generalized()
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, 250, size=(2, 6)), jnp.int32)
    # full-logit parity between the two graphs
    ref = np.asarray(m.forward_logits(ids))
    got = np.asarray(g.forward_logits(ids))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
    # greedy decode through the cache vs eager argmax loop
    out = np.asarray(greedy_generate(g, ids, 8))
    cur = ids
    for _ in range(8):
        nxt = jnp.argmax(m.forward_logits(cur)[:, -1], axis=-1)
        cur = jnp.concatenate([cur, nxt[:, None].astype(cur.dtype)], 1)
    np.testing.assert_array_equal(out, np.asarray(cur))
