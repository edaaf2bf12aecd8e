"""LLaVA-OneVision: SigLIP tower + anyres packing + Qwen2 LM vs the HF
torch oracle, plus the two-modality pipeline.

Reference: llmc/models/llava_onevision.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')
tr = pytest.importorskip('transformers')

IMG = 16          # 4x4 patches of 4
PATCH = 4
IMG_TOK = 126
SIDE = IMG // PATCH                   # 4
# anyres single-pinpoint: base (16) + grid 1x1 with newline (4 rows * 5)
N_IMG_TOK = SIDE * SIDE + SIDE * (SIDE + 1)


def _tiny_hf_onevision():
    from transformers.models.llava_onevision.configuration_llava_onevision \
        import LlavaOnevisionConfig
    from transformers import SiglipVisionConfig
    from transformers.models.qwen2 import Qwen2Config
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=IMG, patch_size=PATCH)
    text = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, tie_word_embeddings=False)
    cfg = LlavaOnevisionConfig(
        vision_config=vision.to_dict(), text_config=text.to_dict(),
        image_token_index=IMG_TOK, vision_feature_layer=-1,
        vision_feature_select_strategy='full',
        vision_aspect_ratio='anyres_max_9',
        image_grid_pinpoints=[[IMG, IMG]])
    torch.manual_seed(0)
    from transformers import LlavaOnevisionForConditionalGeneration
    m = LlavaOnevisionForConditionalGeneration(cfg)
    m.eval()
    return m


def _inputs(rng, B=1, S=None):
    S = S or (N_IMG_TOK + 8)
    ids = rng.randint(0, 120, size=(B, S))
    ids[:, 2:2 + N_IMG_TOK] = IMG_TOK
    # base + one 1x1 anyres crop -> 2 patches per image
    px = rng.randn(B, 2, 3, IMG, IMG).astype(np.float32)
    sizes = [[IMG, IMG]] * B
    return ids, px, sizes


@pytest.fixture(scope='module')
def tiny_onevision_dir(tmp_path_factory):
    m = _tiny_hf_onevision()
    d = tmp_path_factory.mktemp('tiny_onevision')
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_onevision_parity(tiny_onevision_dir):
    path, hf = tiny_onevision_dir
    from llmc_tpu.models.adapter import LlavaOneVisionAdapter
    ours = LlavaOneVisionAdapter.from_pretrained(path, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    ids, px, sizes = _inputs(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px),
                 image_sizes=torch.tensor(sizes)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(
        jnp.asarray(ids), pixel_values=jnp.asarray(px),
        image_sizes=sizes))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_onevision_text_only_parity(tiny_onevision_dir):
    path, hf = tiny_onevision_dir
    from llmc_tpu.models.adapter import LlavaOneVisionAdapter
    ours = LlavaOneVisionAdapter.from_pretrained(path, dtype=jnp.float32)
    ids = np.random.RandomState(1).randint(0, 120, size=(1, 9))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_onevision_two_modality_pipeline(tiny_onevision_dir):
    path, _ = tiny_onevision_dir
    from llmc_tpu.main import run_pipeline
    from llmc_tpu.data.dataset import CalibDataset

    wq = {'bit': 4, 'symmetric': False, 'granularity': 'per_group',
          'group_size': 16}
    config = {
        'model': {'type': 'LlavaOneVision', 'path': path},
        'calib': {'name': 'synthetic_onevision', 'n_samples': 2, 'bs': 1,
                  'seq_len': N_IMG_TOK + 8, 'seed': 0, 'vocab_size': 120,
                  'image_token': IMG_TOK, 'image_seq_length': N_IMG_TOK,
                  'image_size': IMG, 'num_crops': 2,
                  'preproc': 'random_truncate_txt'},
        'quant': {'vision': {'method': 'RTN', 'weight': wq},
                  'language': {'method': 'RTN', 'weight': wq}},
        'eval': {},
    }
    res = run_pipeline(config)
    assert res['model'] is not None
