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


VID_TOK = 127
N_VID_FRAMES = 3
N_VID_TOK = N_VID_FRAMES * (SIDE // 2) ** 2 + 1   # pooled + newline


def _tiny_hf_onevision_video():
    m = _tiny_hf_onevision()
    m.config.video_token_index = VID_TOK
    return m


def test_onevision_video_parity(tiny_onevision_dir):
    """Video branch vs the HF oracle: per-frame tower features, 2x
    bilinear pooling, frame concat + ONE image_newline
    (modeling_llava_onevision.py get_video_features/apply_pooling)."""
    path, hf_model = tiny_onevision_dir
    hf_model.config.video_token_index = VID_TOK
    from llmc_tpu.models.adapter import LlavaOneVisionAdapter
    ours = LlavaOneVisionAdapter.from_pretrained(path, dtype=jnp.float32)
    ours.vl_cfg = __import__('dataclasses').replace(
        ours.vl_cfg, video_token_index=VID_TOK)
    rng = np.random.RandomState(3)
    S = N_VID_TOK + 6
    ids = rng.randint(0, 120, size=(1, S))
    ids[:, 1:1 + N_VID_TOK] = VID_TOK
    vids = rng.randn(1, N_VID_FRAMES, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(input_ids=torch.from_numpy(ids),
                       pixel_values_videos=torch.from_numpy(vids)
                       ).logits.numpy()
    got = np.asarray(ours.forward_logits(
        jnp.asarray(ids), None,
        pixel_values_videos=jnp.asarray(vids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_onevision_video_token_reduction():
    """DyCoke / PruneVid wired into the OneVision video branch shrink
    the sequence; unsupported methods fail loudly."""
    from llmc_tpu.models.adapter import LlavaOneVisionAdapter
    cfg = {'model': {'type': 'LlavaOneVision', 'arch': {
        'vocab_size': 128, 'hidden_size': 64, 'intermediate_size': 128,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 16, 'dtype': 'float32',
        'image_size': IMG, 'patch_size': PATCH,
        'image_token_index': IMG_TOK, 'video_token_index': VID_TOK,
        'vision': {'hidden_size': 32, 'intermediate_size': 64,
                   'num_hidden_layers': 2, 'num_attention_heads': 2}}}}
    ad = LlavaOneVisionAdapter.from_config(cfg)
    rng = np.random.RandomState(4)
    F_ = 4
    n_vid = F_ * (SIDE // 2) ** 2 + 1
    S = n_vid + 5
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + n_vid] = VID_TOK
    one = rng.randn(1, 1, 3, IMG, IMG).astype(np.float32)
    vids = np.repeat(one, F_, axis=1)      # identical frames
    out = ad.forward_logits(
        jnp.asarray(ids), None, pixel_values_videos=jnp.asarray(vids),
        token_reduction={'method': 'PruneVid', 'taus': 0.5,
                         'cluster_ratios': 0.5,
                         'temporal_segment_ratios': 0.25})
    assert out.shape[1] < S                # sequence shrank
    with pytest.raises(NotImplementedError):
        ad.forward_logits(
            jnp.asarray(ids), None,
            pixel_values_videos=jnp.asarray(vids),
            token_reduction={'method': 'FastV', 'prune_layer': 1,
                             'keep': 2})
