"""Llama model parity: our functional JAX Llama vs HF transformers (torch).

The HF model is generated locally (tiny random config, no network) and
serves as the numerical oracle for the forward pass, the safetensors
loader, and the GQA/rope details.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-5,
            rope_theta=10000.0, max_position_embeddings=128)


@pytest.fixture(scope='module')
def tiny_hf_dir(tmp_path_factory):
    torch = pytest.importorskip('torch')
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    cfg = HFLlamaConfig(tie_word_embeddings=False, attention_bias=False,
                        **TINY)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp('tiny_llama')
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_forward_matches_hf(tiny_hf_dir):
    import torch
    path, hf_model = tiny_hf_dir
    from llmc_tpu.models import LlamaAdapter
    ours = LlamaAdapter.from_pretrained(path, dtype=jnp.float32)
    assert ours.cfg.num_key_value_heads == 2
    assert ours.n_blocks == 2
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(ours.forward_logits(jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    assert np.mean(np.argmax(got, -1) == np.argmax(ref, -1)) > 0.99


def test_blockwise_equals_full(tiny_hf_dir):
    """Running embed -> per-block loop -> head must equal forward_logits
    (this is the path the calibration engine uses)."""
    path, _ = tiny_hf_dir
    from llmc_tpu.models import LlamaAdapter
    ours = LlamaAdapter.from_pretrained(path, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, 8)))
    x, kw = ours.embed_and_rope(ids)
    bfn = ours.block_fn()
    for bp in ours.blocks:
        x, caps, _ = bfn(bp, x, kw, capture=True)
        assert set(caps) == {'qkv_in', 'o_in', 'mlp_in', 'down_in'}
    logits = ours.head_fn()(ours.params, x)
    full = ours.forward_logits(ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_inspect_fns_match_block_slices(tiny_hf_dir):
    """inspect fns recompute subset outputs from captured inputs — the
    engine's replacement for the reference's inspect-module forwards."""
    path, _ = tiny_hf_dir
    from llmc_tpu.models import LlamaAdapter
    ours = LlamaAdapter.from_pretrained(path, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 256, (1, 8)))
    x, kw = ours.embed_and_rope(ids)
    bfn = ours.block_fn()
    ifns = ours.inspect_fns()
    layout = ours.get_layout()
    bp = ours.blocks[0]
    y, caps, _ = bfn(bp, x, kw, capture=True)
    for ss in layout.subsets:
        out = ifns[ss.inspect](bp, caps[ss.input_key], kw)
        assert out.shape[0] == 1 and not np.any(np.isnan(np.asarray(out)))


def test_random_init_and_layout():
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    cfg = LlamaConfig(**TINY, tie_word_embeddings=False)
    m = LlamaAdapter.random(cfg)
    layout = m.get_layout()
    assert len(layout.subsets) == 4
    assert layout.capture_key('mlp.down_proj') == 'down_in'
    ids = jnp.zeros((1, 4), jnp.int32)
    logits = m.forward_logits(ids)
    assert logits.shape == (1, 4, 256)


def test_padding_mask_bias(tiny_hf_dir):
    import torch
    path, hf_model = tiny_hf_dir
    from llmc_tpu.models import LlamaAdapter
    ours = LlamaAdapter.from_pretrained(path, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 256, size=(1, 10))
    mask = np.ones((1, 10), np.int64)
    mask[0, :3] = 0  # left padding
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).logits.numpy()
    x, kw = ours.embed_and_rope(jnp.asarray(ids), jnp.asarray(mask))
    bfn = ours.block_fn()
    for bp in ours.blocks:
        x, _, _ = bfn(bp, x, kw)
    got = np.asarray(ours.head_fn()(ours.params, x))
    # only compare non-pad positions
    np.testing.assert_allclose(got[0, 3:], ref[0, 3:], rtol=5e-3, atol=5e-3)
