"""Wan 2.1 video-diffusion tier.

Covers: the functional DiT block (AdaLN affine emulation of
LlmcWanTransformerBlock, module_utils.py:48-127), rope-3d semantics,
the multi-step Catcher equivalent (wan_t2v.py:52-76), AWQ/RTN pipeline
runs over the video_gen modality, and the lightx2v export stamp
(export_lightx2v.py:1-11).  No diffusers in this image, so parity is
self-consistency: transform invariance + reference-cited algebra.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.models import wan as WN
from llmc_tpu.models.adapter import WanI2VAdapter, WanT2VAdapter

F32 = jnp.float32


def tiny_adapter(added_kv=False, **calib):
    cfg = WN.WanConfig.tiny(added_kv=added_kv)
    params = WN.random_params(jax.random.PRNGKey(0), cfg)
    cls = WanI2VAdapter if added_kv else WanT2VAdapter
    cc = dict(sample_steps=3, num_inference_steps=4, guidance_scale=5.0)
    cc.update(calib)
    return cls(cfg, params, calib_cfg=cc)


def sample_kwargs(cfg, key, B=1, N=None, L=6, img=False):
    ks = jax.random.split(key, 5)
    f, h, w = 2, 4, 4
    N = N or f * h * w
    cos, sin = WN.rope_3d(cfg, f, h, w)
    kw = {'temb': jax.random.normal(ks[0], (B, 6, cfg.dim), F32) * 0.1,
          'rope': (jnp.asarray(cos), jnp.asarray(sin)),
          'ctx': jax.random.normal(ks[1], (B, L, cfg.dim), F32),
          'ctx_img': (jax.random.normal(ks[2], (B, 5, cfg.dim), F32)
                      if img else None)}
    x = jax.random.normal(ks[3], (B, N, cfg.dim), F32)
    return x, kw


def test_rope_3d_matches_complex_reference():
    """apply_rope must equal the diffusers view_as_complex rotation:
    interleaved (even, odd) pairs rotated by exp(i*theta)."""
    cfg = WN.WanConfig.tiny()
    f, h, w = 2, 2, 2
    cos, sin = WN.rope_3d(cfg, f, h, w)
    N, hd = f * h * w, cfg.head_dim
    x = np.random.RandomState(0).randn(1, N, 2, hd).astype(np.float32)
    out = np.asarray(WN.apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                   jnp.asarray(sin)))
    xc = x[..., 0::2] + 1j * x[..., 1::2]
    fr = (cos + 1j * sin)[None, :, None, :]
    ref = xc * fr
    np.testing.assert_allclose(out[..., 0::2], ref.real, atol=1e-5)
    np.testing.assert_allclose(out[..., 1::2], ref.imag, atol=1e-5)


def test_affine_emulation_matches_plain_adaln():
    """With affine weights at ones the block must equal the plain Wan
    AdaLN math (the FakeAffineLayerNorm init state): norm1_weight =
    (1+scale)*1, norm1_bias = shift*1 (module_utils.py:92-94)."""
    cfg = WN.WanConfig.tiny()
    bp = WN.random_params(jax.random.PRNGKey(1), cfg)['blocks'][0]
    x, kw = sample_kwargs(cfg, jax.random.PRNGKey(2))
    y, caps, _ = WN.block_apply(bp, cfg, x, kw, capture=True)
    # manual AdaLN for the attn1 stage
    mods = bp['scale_shift_table'][None] + kw['temb']
    shift, scale = mods[:, 0:1], mods[:, 1:2]
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mu) * jax.lax.rsqrt(var + cfg.eps)
    expect = normed * (1 + scale) + shift
    np.testing.assert_allclose(np.asarray(caps['attn1_in']),
                               np.asarray(expect), atol=1e-5)


def test_scale_ln_fcs_on_affine_norm_preserves_function():
    """AWQ's equivalent transform through the emulated affine norm:
    dividing affine_norm1.{w,b} by s and multiplying qkv columns by s
    must leave the block output unchanged (the whole point of
    FakeAffineLayerNorm)."""
    from llmc_tpu.compression.transforms import scale_ln_fcs
    from llmc_tpu.models.base import get_path, set_path
    cfg = WN.WanConfig.tiny()
    bp = WN.random_params(jax.random.PRNGKey(3), cfg)['blocks'][0]
    x, kw = sample_kwargs(cfg, jax.random.PRNGKey(4))
    y0, _, _ = WN.block_apply(bp, cfg, x, kw)
    s = jnp.exp(jax.random.normal(jax.random.PRNGKey(5), (cfg.dim,)) * .5)
    ln = bp['affine_norm1']
    fcs = [get_path(bp, p) for p in
           ('attn1.to_q', 'attn1.to_k', 'attn1.to_v')]
    new_ln, new_fcs = scale_ln_fcs(ln, fcs, s)
    bp2 = set_path(bp, 'affine_norm1', new_ln)
    for p, fc in zip(('attn1.to_q', 'attn1.to_k', 'attn1.to_v'), new_fcs):
        bp2 = set_path(bp2, p, fc)
    y1, _, _ = WN.block_apply(bp2, cfg, x, kw)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4)


def test_capture_keys_cover_layout():
    for added in (False, True):
        cfg = WN.WanConfig.tiny(added_kv=added)
        layout = WN.wan_layout(cfg)
        bp = WN.random_params(jax.random.PRNGKey(6), cfg)['blocks'][0]
        x, kw = sample_kwargs(cfg, jax.random.PRNGKey(7), img=added)
        _, caps, _ = WN.block_apply(bp, cfg, x, kw, capture=True)
        for lin, key in layout.capture_of:
            assert key in caps, (lin, key)


def test_multi_step_capture_counts_and_cfg():
    """sample_steps transformer invocations captured per calib prompt,
    cond+uncond alternating (the reference Catcher counts transformer
    calls, not scheduler steps — wan_t2v.py:62-73)."""
    ad = tiny_adapter(sample_steps=3)
    rng = np.random.RandomState(0)
    batches = [{'text_embeds': rng.randn(1, 6, 32).astype(np.float32),
                'neg_embeds': rng.randn(1, 6, 32).astype(np.float32),
                'latent_shape': (1, 4, 2, 8, 8), 'seed': i}
               for i in range(2)]
    xs, kws = ad.collect_first_block_input(batches)
    assert len(xs) == 6 and len(kws) == 6
    N = 2 * 4 * 4  # (f/pt)*(h/ph)*(w/pw) patches = 2*4*4
    assert xs[0].shape == (1, N, ad.cfg.dim)
    # captures 0 and 1 share latents+timestep, differ in conditioning
    np.testing.assert_allclose(np.asarray(kws[0]['temb']),
                               np.asarray(kws[1]['temb']), atol=1e-6)
    assert not np.allclose(np.asarray(kws[0]['ctx']),
                           np.asarray(kws[1]['ctx']))


def test_rtn_pipeline_video_gen():
    """End-to-end: RTN W8 over the video_gen modality + velocity-cosine
    fake-quant eval + lightx2v export."""
    import tempfile

    from llmc_tpu.main import run_pipeline
    with tempfile.TemporaryDirectory() as td:
        cfg = {
            'base': {'seed': 0},
            'model': {'type': 'WanT2V', 'arch': {}},
            'calib': {'name': 'synthetic_t2v', 'n_samples': 2,
                      'bs': 1, 'text_dim': 32, 'txt_len': 6,
                      'latent_shape': (1, 4, 2, 8, 8),
                      'sample_steps': 2, 'num_inference_steps': 3},
            'eval': {'name': 'synthetic_t2v', 'n_samples': 1,
                     'type': 'video_gen', 'text_dim': 32, 'txt_len': 6,
                     'latent_shape': (1, 4, 2, 8, 8),
                     'num_inference_steps': 2,
                     'eval_pos': ['fake_quant'],
                     'output_video_path': os.path.join(td, 'v')},
            'quant': {'method': 'RTN',
                      'weight': {'bit': 8, 'symmetric': True,
                                 'granularity': 'per_channel'}},
            'save': {'save_lightx2v': True,
                     'save_path': os.path.join(td, 'x2v')},
        }
        res = run_pipeline(cfg)
        assert 'video_fake_quant_velocity_cosine' in res
        assert res['video_fake_quant_velocity_cosine'] > 0.98
        # lightx2v artifact + quant stamp
        import json
        with open(os.path.join(td, 'x2v', 'config.json')) as f:
            assert json.load(f)['quant_method'] == 'advanced_ptq'
        from safetensors.numpy import load_file
        flat = load_file(os.path.join(td, 'x2v', 'model.safetensors'))
        assert 'blocks.0.attn1.to_q.weight' in flat
        assert 'blocks.0.ffn.net.0.proj.weight_scale' in flat
        assert 'blocks.1.scale_shift_table' in flat
        # latents artifact written
        assert any(f.endswith('_latents.npy')
                   for f in os.listdir(os.path.join(td, 'v')))


def test_awq_transform_video_gen_preserves_fp():
    """AWQ over the Wan block graph: the equivalent transform must not
    change the FP forward (velocity field) before fake-quant."""
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'WanT2V', 'arch': {}},
        'calib': {'name': 'synthetic_t2v', 'n_samples': 2, 'bs': 1,
                  'text_dim': 32, 'txt_len': 6,
                  'latent_shape': (1, 4, 2, 8, 8),
                  'sample_steps': 2, 'num_inference_steps': 3},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 32},
                  'special': {'trans': True, 'trans_version': 'v2',
                              'weight_clip': False}},
    }
    ad = WanT2VAdapter.from_config(cfg)
    x, kw = sample_kwargs(ad.cfg, jax.random.PRNGKey(8))
    y_before = WN.block_apply(ad.params['blocks'][0], ad.cfg, x, kw)[0]
    res = run_pipeline(cfg)
    model = res['model']
    y_after = WN.block_apply(model.params['blocks'][0], model.cfg,
                             x, kw)[0]
    np.testing.assert_allclose(np.asarray(y_before),
                               np.asarray(y_after), atol=2e-3)


def test_i2v_image_branch():
    """added-kv cross attention consumes image context; captures carry
    the image tokens for add_k/add_v quantization."""
    cfg = WN.WanConfig.tiny(added_kv=True)
    bp = WN.random_params(jax.random.PRNGKey(9), cfg)['blocks'][0]
    x, kw = sample_kwargs(cfg, jax.random.PRNGKey(10), img=True)
    y_img, caps, _ = WN.block_apply(bp, cfg, x, kw, capture=True)
    kw_no = dict(kw, ctx_img=None)
    y_no, _, _ = WN.block_apply(bp, cfg, x, kw_no)
    assert not np.allclose(np.asarray(y_img), np.asarray(y_no))
    assert caps['attn2_img_in'].shape == kw['ctx_img'].shape
