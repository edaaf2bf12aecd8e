"""Qwen2-Audio tier: Whisper tower on the generalized graph + splice."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.models.adapter import Qwen2AudioAdapter
from llmc_tpu.models.qwen2audio import _conv1d, sinusoids

F32 = jnp.float32


def tiny_adapter():
    cfg = {'model': {'type': 'Qwen2Audio', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'audio_token_index': 70, 'num_mel_bins': 16,
        'max_source_positions': 64,
        'audio': {'d_model': 32, 'encoder_ffn_dim': 64,
                  'encoder_layers': 2, 'encoder_attention_heads': 4}}}}
    return Qwen2AudioAdapter.from_config(cfg)


def test_conv1d_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 12).astype(np.float32)
    w = rng.randn(7, 5, 3).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    for stride in (1, 2):
        ours = np.asarray(_conv1d({'w': jnp.asarray(w),
                                   'b': jnp.asarray(b)},
                                  jnp.asarray(x), stride))
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w),
            torch.from_numpy(b), stride=stride, padding=1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sinusoids_shape_and_symmetry():
    s = sinusoids(10, 8)
    assert s.shape == (10, 8)
    np.testing.assert_allclose(s[0, 4:], np.ones(4))   # cos(0) = 1


def test_forward_audio_influences_logits():
    ad = tiny_adapter()
    cfg = ad.alm_cfg
    rng = np.random.RandomState(1)
    t_mel = 32
    span = t_mel // 4                                  # conv2 + avgpool
    S = span + 6
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = 70
    mel = rng.randn(1, cfg.num_mel_bins, t_mel).astype(np.float32)
    l1 = ad.forward_logits(jnp.asarray(ids),
                           input_features=jnp.asarray(mel))
    assert l1.shape == (1, S, 72)
    l2 = ad.forward_logits(jnp.asarray(ids),
                           input_features=jnp.asarray(mel * 0.5))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # positions outside the audio span see identical embeds pre-blocks
    l3 = ad.forward_logits(jnp.asarray(ids))
    assert not np.allclose(np.asarray(l1), np.asarray(l3))


def test_pipeline_both_modalities():
    """RTN over vision (audio tower) + language sub-configs, mirroring
    the reference's modality dispatch (utils.py:84 — audio lives under
    'vision')."""
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'Qwen2Audio', 'arch': {
            'vocab_size': 72, 'hidden_size': 32,
            'intermediate_size': 64, 'num_hidden_layers': 2,
            'num_attention_heads': 4, 'num_key_value_heads': 2,
            'head_dim': 8, 'dtype': 'float32', 'audio_token_index': 70,
            'num_mel_bins': 16, 'max_source_positions': 64,
            'audio': {'d_model': 32, 'encoder_ffn_dim': 64,
                      'encoder_layers': 2,
                      'encoder_attention_heads': 4}}},
        'calib': {'name': 'synthetic_qwen2audio', 'n_samples': 2,
                  'bs': 1, 'seq_len': 20, 'vocab_size': 70,
                  'audio_token': 70, 'num_mel_bins': 16, 'mel_len': 32},
        'quant': {
            'vision': {'method': 'RTN',
                       'weight': {'bit': 8, 'symmetric': True,
                                  'granularity': 'per_channel'}},
            'language': {'method': 'RTN',
                         'weight': {'bit': 8, 'symmetric': True,
                                    'granularity': 'per_channel'}}},
    }
    res = run_pipeline(cfg)
    assert res['opt'] is not None
