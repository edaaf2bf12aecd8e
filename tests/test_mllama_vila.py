"""Mllama heterogeneous cross-attention graph + Vila adapter."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from llmc_tpu.models.adapter import MllamaAdapter, VilaAdapter

F32 = jnp.float32

ARCH = {'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 4, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'cross_attention_layers': [1, 3]}


def tiny_mllama():
    return MllamaAdapter.from_config({'model': {'type': 'Mllama',
                                                'arch': dict(ARCH)}})


def test_cross_blocks_identity_without_states():
    ad = tiny_mllama()
    ids = jnp.asarray(np.arange(6)[None], jnp.int32)
    l0 = ad.forward_logits(ids)            # cross layers are identity
    assert l0.shape == (1, 6, 72)
    rng = np.random.RandomState(0)
    cross = jnp.asarray(rng.randn(1, 5, 32), F32)
    l1 = ad.forward_logits(ids, cross_states=cross)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_gates_control_cross_contribution():
    ad = tiny_mllama()
    rng = np.random.RandomState(1)
    cross = jnp.asarray(rng.randn(1, 5, 32), F32)
    ids = jnp.asarray(np.arange(6)[None], jnp.int32)
    l1 = ad.forward_logits(ids, cross_states=cross)
    for li in (1, 3):
        ad.params['blocks'][li]['cross_attn_attn_gate'] = \
            jnp.asarray([0.0], F32)
        ad.params['blocks'][li]['cross_attn_mlp_gate'] = \
            jnp.asarray([0.0], F32)
    l0 = ad.forward_logits(ids, cross_states=cross)
    lref = ad.forward_logits(ids)
    # tanh(0)=0 gates: cross blocks become identity == no-image path
    np.testing.assert_allclose(np.asarray(l0), np.asarray(lref),
                               atol=1e-5)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_layout_union_and_capture():
    ad = tiny_mllama()
    layout = ad.get_layout()
    names = [s.name for s in layout.subsets]
    assert {'qkv', 'o', 'gate_up', 'down', 'cross_q', 'cross_kv',
            'cross_o'} <= set(names)
    fn = ad.block_fn()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 32), F32)
    from llmc_tpu.models import llama as L
    cos, sin = L.rope_cos_sin(ad.cfg, jnp.arange(6)[None, :])
    kw = {'cos': cos, 'sin': sin,
          'cross': jnp.asarray(rng.randn(1, 5, 32), F32)}
    _, caps_self, _ = fn(ad.params['blocks'][0], x, kw, capture=True)
    assert 'qkv_in' in caps_self and 'cross_q_in' not in caps_self
    _, caps_cross, _ = fn(ad.params['blocks'][1], x, kw, capture=True)
    assert 'cross_q_in' in caps_cross and 'cross_kv_in' in caps_cross
    assert 'mlp_in' in caps_cross


def test_mllama_awq_pipeline():
    """AWQ over the heterogeneous graph: has_path routing must transform
    both block kinds; FP forward preserved."""
    from llmc_tpu.main import run_pipeline
    cfg = {
        'base': {'seed': 0},
        'model': {'type': 'Mllama', 'arch': dict(ARCH)},
        'calib': {'name': 'synthetic_mllama', 'n_samples': 2, 'bs': 1,
                  'seq_len': 12, 'vocab_size': 72, 'hidden_size': 32,
                  'cross_len': 5},
        'quant': {'method': 'Awq',
                  'weight': {'bit': 4, 'symmetric': False,
                             'granularity': 'per_group',
                             'group_size': 16},
                  'special': {'trans': True, 'trans_version': 'v2',
                              'weight_clip': False}},
    }
    ad = MllamaAdapter.from_config(cfg)
    ids = jnp.asarray(np.arange(8)[None], jnp.int32)
    rng = np.random.RandomState(3)
    cross = jnp.asarray(rng.randn(1, 5, 32), F32)
    before = ad.forward_logits(ids, cross_states=cross)
    res = run_pipeline(cfg)
    after = res['model'].forward_logits(ids, cross_states=cross)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               atol=2e-3)


def test_vila_language_only():
    ad = VilaAdapter.from_config({'model': {'type': 'Vila', 'arch': {
        'vocab_size': 64, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32'}}})
    ids = jnp.asarray(np.arange(6)[None], jnp.int32)
    logits = ad.forward_logits(ids)
    assert logits.shape == (1, 6, 64)
    try:
        ad.set_modality('vision')
        raise RuntimeError('should have asserted')
    except AssertionError:
        pass
