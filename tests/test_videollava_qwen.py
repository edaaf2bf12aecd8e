"""VideoLlava tier + DyCoke/DART token reduction + Qwen(v1) loader."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.compression.token_reduction import (dart_keep_indices,
                                                  dycoke_ttm)
from llmc_tpu.models.adapter import QwenAdapter, VideoLlavaAdapter

F32 = jnp.float32


def tiny_videollava():
    cfg = {'model': {'type': 'VideoLlava', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_size': 28, 'patch_size': 14, 'image_token_index': 70,
        'video_token_index': 71, 'num_frames': 4}}}
    return VideoLlavaAdapter.from_config(cfg)


def test_dycoke_ttm_static_structure():
    rng = np.random.RandomState(0)
    F_, N, C = 8, 6, 16
    feats = jnp.asarray(rng.randn(F_ * N, C), F32)
    out = dycoke_ttm(feats, N, merging_ratio=0.5)
    keep = int(0.5 * N)
    # frames 0,4,6 full; 1,2,3,5,7 pruned to keep (dycoke.py:50-100)
    assert out.shape == (3 * N + 5 * keep, C)
    np.testing.assert_allclose(np.asarray(out[:N]),
                               np.asarray(feats[:N]))


def test_dart_keep_indices_properties():
    rng = np.random.RandomState(1)
    S, D, HD = 40, 16, 24
    v0, v_num = 5, 20
    hidden = jnp.asarray(rng.randn(S, D), F32)
    keys = jnp.asarray(rng.randn(S, HD), F32)
    idx = np.asarray(dart_keep_indices(hidden, keys, v0, v_num,
                                       pivot_image_token=2,
                                       pivot_text_token=2,
                                       reduction_ratio=0.5))
    # static count: pivot_image + P*topk, topk = (20*0.5)//4 = 2
    assert idx.shape == (2 + 4 * 2,)
    assert (idx >= v0).all() and (idx < v0 + v_num).all()
    assert len(set(idx.tolist())) == len(idx)       # no duplicates
    assert (np.diff(idx) > 0).all()                 # sorted


def test_videollava_forward_and_dycoke():
    ad = tiny_videollava()
    cfg = ad.llava_cfg
    rng = np.random.RandomState(2)
    span = cfg.num_frames * cfg.image_seq_length    # 4*4 = 16
    S = span + 8
    ids = np.full((1, S), 3, np.int32)
    ids[0, 2:2 + span] = 71
    vids = rng.randn(1, cfg.num_frames, 3, 28, 28).astype(np.float32)
    logits = ad.forward_logits(jnp.asarray(ids), None,
                               pixel_values_videos=jnp.asarray(vids))
    assert logits.shape == (1, S, 72)
    # video features actually influence the output
    logits2 = ad.forward_logits(jnp.asarray(ids), None,
                                pixel_values_videos=jnp.asarray(
                                    vids * 0.5))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))
    # DyCoke shrinks the sequence: F=4, N=4, ratio .5 ->
    # frames 0,2 full... (F-4 loop empty) -> frames 0,2 full? even pass:
    # 0 full, 1 keep2, 2 full, 3 keep2 = 4+2+4+2 = 12
    red = ad.forward_logits(jnp.asarray(ids), None,
                            pixel_values_videos=jnp.asarray(vids),
                            token_reduction={'method': 'DyCoke',
                                             'merging_ratio': 0.5})
    assert red.shape == (1, S - span + 12, 72)


def test_dart_wiring_on_llava_graph():
    from llmc_tpu.models.adapter import LlavaAdapter
    cfg = {'model': {'type': 'Llava', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 3, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_size': 28, 'patch_size': 14, 'image_token_index': 70}}}
    ad = LlavaAdapter.from_config(cfg)
    c = ad.llava_cfg
    rng = np.random.RandomState(3)
    span = c.image_seq_length                       # 4
    S = span + 12
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = 70
    px = rng.randn(1, 3, 28, 28).astype(np.float32)
    out = ad.forward_logits(
        jnp.asarray(ids), None, pixel_values=jnp.asarray(px),
        token_reduction={'method': 'DART', 'pruning_loc': 1,
                         'pivot_image_token': 1, 'pivot_text_token': 1,
                         'reduction_ratio': 0.5})
    # retained = 1 + 2*((4*0.5)//2 = 1) = 3 image tokens of 4
    assert out.shape == (1, S - span + 3, 72)


def test_videollava_pipeline_rtn():
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'VideoLlava', 'arch': {
            'vocab_size': 72, 'hidden_size': 32,
            'intermediate_size': 64, 'num_hidden_layers': 2,
            'num_attention_heads': 4, 'num_key_value_heads': 2,
            'head_dim': 8, 'dtype': 'float32', 'image_size': 28,
            'patch_size': 14, 'image_token_index': 70,
            'video_token_index': 71, 'num_frames': 4}},
        'calib': {'name': 'synthetic_videollava', 'n_samples': 2,
                  'bs': 1, 'seq_len': 24, 'vocab_size': 70,
                  'video_token': 71, 'num_frames': 4,
                  'image_seq_length': 4, 'image_size': 28},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'}},
    }
    res = run_pipeline(cfg)
    assert res['opt'] is not None


def test_qwen_v1_loader_split(tmp_path):
    """QWen naming -> Llama graph: fused c_attn split must reproduce
    logits of the hand-split checkpoint."""
    from safetensors.numpy import save_file
    rng = np.random.RandomState(4)
    D, FF, L_, V, H = 32, 48, 2, 64, 4
    cfgj = {'vocab_size': V, 'hidden_size': D,
            'intermediate_size': 2 * FF, 'num_hidden_layers': L_,
            'num_attention_heads': H, 'layer_norm_epsilon': 1e-6,
            'rotary_emb_base': 10000.0, 'seq_length': 128,
            'model_type': 'qwen'}
    flat = {'transformer.wte.weight':
            rng.randn(V, D).astype(np.float32),
            'transformer.ln_f.weight':
            np.ones(D, np.float32),
            'lm_head.weight': rng.randn(V, D).astype(np.float32)}
    for i in range(L_):
        b = f'transformer.h.{i}'
        flat[f'{b}.ln_1.weight'] = np.ones(D, np.float32)
        flat[f'{b}.ln_2.weight'] = np.ones(D, np.float32)
        flat[f'{b}.attn.c_attn.weight'] = \
            rng.randn(3 * D, D).astype(np.float32) * 0.1
        flat[f'{b}.attn.c_attn.bias'] = \
            rng.randn(3 * D).astype(np.float32) * 0.1
        flat[f'{b}.attn.c_proj.weight'] = \
            rng.randn(D, D).astype(np.float32) * 0.1
        flat[f'{b}.mlp.w1.weight'] = \
            rng.randn(FF, D).astype(np.float32) * 0.1
        flat[f'{b}.mlp.w2.weight'] = \
            rng.randn(FF, D).astype(np.float32) * 0.1
        flat[f'{b}.mlp.c_proj.weight'] = \
            rng.randn(D, FF).astype(np.float32) * 0.1
    d = str(tmp_path)
    save_file(flat, os.path.join(d, 'model.safetensors'))
    with open(os.path.join(d, 'config.json'), 'w') as f:
        json.dump(cfgj, f)
    ad = QwenAdapter.from_pretrained(d, dtype=jnp.float32)
    assert ad.cfg.intermediate_size == FF
    ids = jnp.asarray(np.arange(8)[None], jnp.int32)
    logits = ad.forward_logits(ids)
    assert logits.shape == (1, 8, V)
    # MLP orientation: silu gate is w2 (qwen.py:80-87 c_proj prev w1)
    bp = ad.params['blocks'][0]
    np.testing.assert_allclose(
        np.asarray(bp['mlp']['gate_proj']['w']),
        flat['transformer.h.0.mlp.w2.weight'])
    np.testing.assert_allclose(
        np.asarray(bp['mlp']['up_proj']['w']),
        flat['transformer.h.0.mlp.w1.weight'])
    # q/k/v split preserves rows
    np.testing.assert_allclose(
        np.asarray(bp['self_attn']['q_proj']['w']),
        flat['transformer.h.0.attn.c_attn.weight'][:D])
