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
    for name in ('FastV', 'ToMe', 'DivPrune', 'VisionZip', 'FasterVLM',
                 'SparseVLM', 'PyramidDrop', 'DART', 'DyCoke'):
        assert name in TOKEN_REDUCTION_REGISTRY
    # unimplemented names must NOT be silently registered (fail loudly)
    for name in ('MustDrop', 'PruneVid', 'FastVID', 'HoliTom'):
        assert name not in TOKEN_REDUCTION_REGISTRY


def test_fastervlm_select_by_cls_attention():
    from llmc_tpu.compression.token_reduction import fastervlm_select
    B, H, N = 1, 2, 8
    attn = np.full((B, H, N), 0.01, np.float32)
    attn[:, :, [1, 4, 6]] = 1.0
    idx = np.asarray(fastervlm_select(jnp.asarray(attn), keep=3))[0]
    assert idx.tolist() == [1, 4, 6]          # sorted original order


def test_visionzip_reduce_shapes_and_dominant():
    from llmc_tpu.compression.token_reduction import visionzip_reduce
    rng = np.random.RandomState(0)
    B, N, D, hd = 1, 12, 16, 8
    hidden = rng.randn(B, 1 + N, D).astype(np.float32)
    attn = np.full((B, 2, 1 + N, 1 + N), 0.01, np.float32)
    attn[:, :, 0, [3, 7]] = 1.0               # CLS attends to patches 2,6
    metric = rng.randn(B, 1 + N, hd).astype(np.float32)
    out = np.asarray(visionzip_reduce(jnp.asarray(hidden),
                                      jnp.asarray(attn),
                                      jnp.asarray(metric),
                                      dominant=2, contextual=3))
    assert out.shape == (B, 1 + 2 + 3, D)
    # CLS + the two dominant patches preserved exactly, original order
    np.testing.assert_array_equal(out[0, 0], hidden[0, 0])
    np.testing.assert_array_equal(out[0, 1], hidden[0, 3])
    np.testing.assert_array_equal(out[0, 2], hidden[0, 7])


def test_dpc_cluster_merge_recovers_clusters():
    from llmc_tpu.compression.token_reduction import dpc_cluster_merge
    rng = np.random.RandomState(1)
    c1, c2 = rng.randn(4), rng.randn(4) + 10
    x = np.stack([c1, c1, c1, c2, c2, c2]).astype(np.float32)[None]
    out = np.asarray(dpc_cluster_merge(jnp.asarray(x), 2))[0]
    got = sorted(out.tolist(), key=lambda v: v[0])
    exp = sorted([c1.tolist(), c2.tolist()], key=lambda v: v[0])
    np.testing.assert_allclose(got, exp, atol=1e-5)
