"""GLM-4V and InternOmni adapters + decode chunking regression."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.models.adapter import Glm4vAdapter, InternOmniAdapter

F32 = jnp.float32


def test_chunk_never_full_length():
    from llmc_tpu.serve.decode import _chunk_for
    for smax in (64, 96, 128, 160, 256, 512, 1024):
        c = _chunk_for(smax)
        if c is not None and smax > 32:
            # chunk == smax turns the cache read into a whole-buffer
            # copy (4 GB temp at B=128/max_len=128 -> compile OOM)
            assert c < smax, (smax, c)
    assert _chunk_for(32) == 32


def glm4v():
    return Glm4vAdapter.from_config({'model': {'type': 'Glm4v', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_token_index': 70,
        'vision': {'hidden_size': 32, 'intermediate_size': 64,
                   'num_hidden_layers': 2, 'num_attention_heads': 2,
                   'image_size': 28, 'patch_size': 14}}}})


def test_glm4v_image_splice_in_calib():
    ad = glm4v()
    rng = np.random.RandomState(0)
    # tower 28/14 -> 2x2 patches -> 2x2 conv -> 1 token; +boi/eoi = 3
    span = 3
    S = span + 6
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = 70
    batches = [{'input_ids': ids,
                'pixel_values': rng.randn(1, 3, 28, 28).astype(
                    np.float32)}]
    xs, kws = ad.collect_first_block_input(batches)
    x_img = np.asarray(xs[0])
    xs2, _ = ad.collect_first_block_input([{'input_ids': ids}])
    x_txt = np.asarray(xs2[0])
    assert not np.allclose(x_img[0, 1:1 + span], x_txt[0, 1:1 + span])
    np.testing.assert_allclose(x_img[0, 1 + span:], x_txt[0, 1 + span:])


def test_glm4v_language_only_guard():
    ad = glm4v()
    try:
        ad.set_modality('vision')
        raise RuntimeError('should have asserted')
    except AssertionError:
        pass


def test_internomni_audio_splice():
    ad = InternOmniAdapter.from_config({'model': {
        'type': 'InternOmni', 'arch': {
            'vocab_size': 72, 'hidden_size': 32,
            'intermediate_size': 64, 'num_hidden_layers': 2,
            'num_attention_heads': 4, 'num_key_value_heads': 2,
            'head_dim': 8, 'dtype': 'float32', 'audio_token_index': 70,
            'audio': {'d_model': 32, 'encoder_ffn_dim': 64,
                      'encoder_layers': 2, 'encoder_attention_heads': 4,
                      'num_mel_bins': 16, 'max_source_positions': 64}}}})
    rng = np.random.RandomState(1)
    t_mel = 32
    span = t_mel // 4
    S = span + 5
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = 70
    mel = rng.randn(1, 16, t_mel).astype(np.float32)
    xs, _ = ad.collect_first_block_input(
        [{'input_ids': ids, 'input_features': mel}])
    xs2, _ = ad.collect_first_block_input([{'input_ids': ids}])
    a, b = np.asarray(xs[0]), np.asarray(xs2[0])
    assert not np.allclose(a[0, 1:1 + span], b[0, 1:1 + span])
    np.testing.assert_allclose(a[0, 1 + span:], b[0, 1 + span:])


def test_glm4v_rtn_pipeline():
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'Glm4v', 'arch': {
            'vocab_size': 72, 'hidden_size': 32,
            'intermediate_size': 64, 'num_hidden_layers': 2,
            'num_attention_heads': 4, 'num_key_value_heads': 2,
            'head_dim': 8, 'dtype': 'float32', 'image_token_index': 70,
            'vision': {'hidden_size': 32, 'intermediate_size': 64,
                       'num_hidden_layers': 2, 'num_attention_heads': 2,
                       'image_size': 28, 'patch_size': 14}}},
        'calib': {'name': 'synthetic_vlm', 'n_samples': 2, 'bs': 1,
                  'seq_len': 16, 'vocab_size': 70, 'image_token': 70,
                  'image_seq_length': 3, 'image_size': 28},
        'quant': {'method': 'RTN',
                  'weight': {'bit': 8, 'symmetric': True,
                             'granularity': 'per_channel'}},
    }
    res = run_pipeline(cfg)
    assert res['opt'] is not None
