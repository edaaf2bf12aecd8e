"""InternVL: InternViT (layer-scale) + pixel shuffle + projector +
Qwen2 LM vs the HF torch oracle, plus the two-modality pipeline.

Reference: llmc/models/internvl2.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')
tr = pytest.importorskip('transformers')

IMG = 16          # 4x4 patches of 4
PATCH = 4
IMG_TOK = 126
# 16 patches -> pixel shuffle 0.5 -> 4 merged image tokens
N_IMG_TOK = 4


def _tiny_hf_internvl(use_qk_norm=False):
    from transformers.models.internvl.configuration_internvl import (
        InternVLConfig, InternVLVisionConfig)
    from transformers.models.qwen2 import Qwen2Config
    vision = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), use_absolute_position_embeddings=True,
        layer_scale_init_value=0.1, norm_type='layer_norm',
        use_qk_norm=use_qk_norm, attention_bias=True,
        use_mean_pooling=False, hidden_dropout_prob=0.0,
        attention_dropout=0.0, projection_dropout=0.0)
    text = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, tie_word_embeddings=False)
    cfg = InternVLConfig(vision_config=vision.to_dict(),
                         text_config=text.to_dict(),
                         image_token_id=IMG_TOK, downsample_ratio=0.5,
                         vision_feature_layer=-1,
                         vision_feature_select_strategy='default')
    torch.manual_seed(0)
    from transformers import InternVLForConditionalGeneration
    m = InternVLForConditionalGeneration(cfg)
    m.eval()
    return m


def _inputs(rng, B=2, S=12):
    ids = rng.randint(0, 120, size=(B, S))
    ids[:, 2:2 + N_IMG_TOK] = IMG_TOK
    px = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    return ids, px


@pytest.fixture(scope='module')
def tiny_internvl_dir(tmp_path_factory):
    m = _tiny_hf_internvl()
    d = tmp_path_factory.mktemp('tiny_internvl')
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_internvl_parity(tiny_internvl_dir):
    path, hf = tiny_internvl_dir
    from llmc_tpu.models.adapter import InternVLAdapter
    ours = InternVLAdapter.from_pretrained(path, dtype=jnp.float32)
    assert ours.vl_cfg.image_seq_length == N_IMG_TOK
    rng = np.random.RandomState(0)
    ids, px = _inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(
        jnp.asarray(ids), pixel_values=jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_internvl_qk_norm_parity(tmp_path):
    hf = _tiny_hf_internvl(use_qk_norm=True)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from llmc_tpu.models.adapter import InternVLAdapter
    ours = InternVLAdapter.from_pretrained(str(tmp_path),
                                           dtype=jnp.float32)
    rng = np.random.RandomState(3)
    ids, px = _inputs(rng, B=1)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(
        jnp.asarray(ids), pixel_values=jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_internvl_two_modality_pipeline(tiny_internvl_dir):
    path, _ = tiny_internvl_dir
    from llmc_tpu.main import run_pipeline
    wq = {'bit': 4, 'symmetric': False, 'granularity': 'per_group',
          'group_size': 16}
    config = {
        'model': {'type': 'InternVL2', 'path': path},
        'calib': {'name': 'synthetic_vlm', 'n_samples': 2, 'bs': 1,
                  'seq_len': 12, 'seed': 0, 'vocab_size': 120,
                  'image_token': IMG_TOK, 'image_seq_length': N_IMG_TOK,
                  'image_size': IMG, 'preproc': 'random_truncate_txt'},
        'quant': {'vision': {'method': 'RTN', 'weight': wq},
                  'language': {'method': 'GPTQ', 'weight': wq}},
        'eval': {},
    }
    res = run_pipeline(config)
    assert res['model'] is not None
