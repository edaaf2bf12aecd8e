"""Qwen2-VL: ViT (2D rope + merger) + Qwen2 LM with M-RoPE vs the HF
torch oracle, plus the two-modality compression pipeline.

Reference: llmc/models/qwen2vl.py (the reference wraps HF modules; here
the graph is native, so parity is checked logit-for-logit).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')
tr = pytest.importorskip('transformers')

GRID = (1, 4, 4)      # t, h, w patches -> 16 patches, 4 merged tokens
MERGED = 4
PATCH = 4             # tiny patch size
IMG_TOK = 126
VSTART = 125


def _tiny_hf_qwen2vl():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLConfig, Qwen2VLTextConfig, Qwen2VLVisionConfig)
    vision = Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=2, hidden_size=64, mlp_ratio=2,
        in_channels=3, patch_size=PATCH, temporal_patch_size=2,
        spatial_merge_size=2)
    text = Qwen2VLTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_scaling={
            'type': 'mrope', 'mrope_section': [2, 3, 3]},
        tie_word_embeddings=False)
    cfg = Qwen2VLConfig(vision_config=vision.to_dict(),
                        text_config=text.to_dict(),
                        image_token_id=IMG_TOK, video_token_id=124,
                        vision_start_token_id=VSTART)
    torch.manual_seed(0)
    from transformers import Qwen2VLForConditionalGeneration
    m = Qwen2VLForConditionalGeneration(cfg)
    m.eval()
    return m


def _inputs(rng, B=1, S=14):
    ids = rng.randint(0, 120, size=(B, S))
    ids[:, 1] = VSTART
    ids[:, 2:2 + MERGED] = IMG_TOK
    t, h, w = GRID
    n = t * h * w
    patches = rng.randn(n * B, 3 * 2 * PATCH * PATCH).astype(np.float32)
    return ids, patches


@pytest.fixture(scope='module')
def tiny_qwen2vl_dir(tmp_path_factory):
    m = _tiny_hf_qwen2vl()
    d = tmp_path_factory.mktemp('tiny_qwen2vl')
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_qwen2vl_parity(tiny_qwen2vl_dir):
    path, hf = tiny_qwen2vl_dir
    from llmc_tpu.models.adapter import Qwen2VLAdapter
    ours = Qwen2VLAdapter.from_pretrained(path, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    ids, patches = _inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor([list(GRID)])
                 ).logits.float().numpy()
    got = np.asarray(ours.forward_logits(
        jnp.asarray(ids), pixel_patches=jnp.asarray(patches),
        grid_thw=GRID))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_qwen2vl_text_only_parity(tiny_qwen2vl_dir):
    path, hf = tiny_qwen2vl_dir
    from llmc_tpu.models.adapter import Qwen2VLAdapter
    ours = Qwen2VLAdapter.from_pretrained(path, dtype=jnp.float32)
    ids = np.random.RandomState(1).randint(0, 120, size=(1, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_qwen2vl_two_modality_pipeline(tiny_qwen2vl_dir):
    path, _ = tiny_qwen2vl_dir
    from llmc_tpu.main import run_pipeline
    wq = {'bit': 4, 'symmetric': False, 'granularity': 'per_group',
          'group_size': 16}
    config = {
        'model': {'type': 'Qwen2vl', 'path': path},
        'calib': {'name': 'synthetic_qwen2vl', 'n_samples': 2, 'bs': 1,
                  'seq_len': 14, 'seed': 0, 'vocab_size': 120,
                  'image_token': IMG_TOK, 'vision_start_token': VSTART,
                  'grid_hw': (4, 4), 'patch_dim': 3 * 2 * PATCH * PATCH,
                  'preproc': 'random_truncate_txt'},
        'quant': {'vision': {'method': 'RTN', 'weight': wq},
                  'language': {'method': 'Awq', 'weight': wq,
                               'special': {'trans': True}}},
        'eval': {},
    }
    res = run_pipeline(config)
    assert res['model'] is not None
