"""Token-reduction operator tests (FastV / ToMe / DivPrune)."""

import numpy as np

import jax
import jax.numpy as jnp

from llmc_tpu.compression.token_reduction import (divprune_select,
                                                  fastv_prune, tome_merge)


def test_fastv_keeps_high_attention_tokens():
    rng = np.random.RandomState(0)
    B, H, S, D = 1, 2, 16, 8
    hidden = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    attn = np.full((B, H, S, S), 0.01, np.float32)
    # vision tokens are positions 4..12; token 6 and 9 get high attention
    attn[:, :, :, 6] = 1.0
    attn[:, :, :, 9] = 0.9
    out, idx = fastv_prune(hidden, jnp.asarray(attn), (4, 12), keep=2)
    assert out.shape == (B, S - 8 + 2, D)
    kept_vision = set(np.asarray(idx[0]).tolist()) & set(range(4, 12))
    assert kept_vision == {6, 9}


def test_tome_reduces_and_preserves_distinct():
    rng = np.random.RandomState(1)
    B, S, D = 2, 16, 8
    toks = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    out = tome_merge(toks, r=3)
    assert out.shape == (B, S - 3, D)
    assert np.isfinite(np.asarray(out)).all()


def test_tome_merges_duplicates():
    # identical even/odd pairs should merge to (nearly) the same vector
    base = np.random.RandomState(2).randn(1, 4, 8).astype(np.float32)
    toks = np.repeat(base, 2, axis=1)  # [1, 8, 8], a_i == b_i
    out = np.asarray(tome_merge(jnp.asarray(toks), r=2))
    assert out.shape == (1, 6, 8)


def test_divprune_selects_diverse():
    # two tight clusters + one outlier; keep=3 must include the outlier
    pts = np.zeros((1, 9, 4), np.float32)
    pts[0, :4] = [1, 0, 0, 0]
    pts[0, 4:8] = [0, 1, 0, 0]
    pts[0, 8] = [0, 0, 1, 0]
    idx = np.asarray(divprune_select(jnp.asarray(pts), keep=3))[0]
    assert 8 in idx.tolist()
    # one from each cluster
    assert any(i < 4 for i in idx) and any(4 <= i < 8 for i in idx)


def test_registry_has_methods():
    import llmc_tpu.compression.token_reduction  # noqa: F401
    from llmc_tpu.utils import TOKEN_REDUCTION_REGISTRY
    for name in ('FastV', 'ToMe', 'DivPrune', 'VisionZip', 'HoliTom'):
        assert name in TOKEN_REDUCTION_REGISTRY
