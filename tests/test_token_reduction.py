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
                 'SparseVLM', 'PyramidDrop', 'DART', 'DyCoke',
                 'MustDrop', 'PruneVid', 'FastVID', 'HoliTom'):
        assert name in TOKEN_REDUCTION_REGISTRY
    # all 13 reference methods are now implemented
    assert 'NoSuchMethod' not in TOKEN_REDUCTION_REGISTRY


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


def test_mustdrop_spatial_merge():
    import numpy as np
    from llmc_tpu.compression.token_reduction import mustdrop_spatial_merge
    rng = np.random.RandomState(0)
    B, g, C = 1, 4, 8
    x = jnp.asarray(rng.randn(B, 1 + g * g, C), jnp.float32)
    # threshold -1: every window merges -> cls + 4 window means
    out = mustdrop_spatial_merge(x, threshold=-1.0)
    assert out.shape == (B, 1 + 4, C)
    # threshold > 1: nothing merges
    out2 = mustdrop_spatial_merge(x, threshold=1.5)
    assert out2.shape == x.shape
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x))
    # window means are exact means of the window tokens
    feat = np.asarray(x)[0, 1:].reshape(2, 2, 2, 2, C).transpose(
        0, 2, 1, 3, 4).reshape(4, 4, C)
    got = np.asarray(out)[0, 1:]
    want = feat.mean(axis=1)
    # merged windows ordered by similarity rank; compare as sets
    for w in want:
        assert np.min(np.abs(got - w[None]).sum(-1)) < 1e-4


def test_mustdrop_wired_into_llava():
    import numpy as np
    from llmc_tpu.models.adapter import LlavaAdapter
    cfg = {'model': {'type': 'Llava', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_size': 56, 'patch_size': 14, 'image_token_index': 70}}}
    ad = LlavaAdapter.from_config(cfg)
    c = ad.llava_cfg
    rng = np.random.RandomState(1)
    span = c.image_seq_length                       # 16
    S = span + 6
    ids = np.full((1, S), 3, np.int32)
    ids[0, 1:1 + span] = 70
    px = rng.randn(1, 3, 56, 56).astype(np.float32)
    out = ad.forward_logits(
        jnp.asarray(ids), None, pixel_values=jnp.asarray(px),
        token_reduction={'method': 'MustDrop',
                         'spatial_threshold': -1.0})
    # every 2x2 window merges: 16 patches -> 4 merged
    assert out.shape == (1, S - span + 4, 72)


def test_prunevid_merge_static_and_dynamic():
    import numpy as np
    from llmc_tpu.compression.token_reduction import prunevid_merge
    rng = np.random.RandomState(0)
    F_, L, C = 4, 8, 16
    base = rng.randn(1, L, C).astype(np.float32)
    # identical frames: every token static -> one window, mean == base
    frames = jnp.asarray(np.repeat(base, F_, axis=0))
    out = prunevid_merge(frames, taus=0.5, cluster_ratio=0.5,
                         temporal_ratio=0.25)
    # all tokens static across identical frames: output is the (possibly
    # dpc-merged) window mean set, no larger than L tokens
    assert out.shape[0] <= L and out.shape[1] == C
    # with L=8 <= min_spatial no dpc merge happens: exact window mean
    np.testing.assert_allclose(np.asarray(out), base[0], atol=1e-5)


def test_fastvid_prune_counts():
    import numpy as np
    from llmc_tpu.compression.token_reduction import fastvid_prune
    rng = np.random.RandomState(1)
    F_, N, C = 4, 16, 8
    frames = jnp.asarray(rng.randn(F_, N, C), jnp.float32)
    attn = jnp.asarray(rng.rand(F_, N), jnp.float32)
    glob = jnp.asarray(rng.randn(F_, C), jnp.float32)
    out = fastvid_prune(frames, attn, glob, DySeg_c=2, DySeg_tau=-1.0,
                        retention_ratio=0.5, STPrune_d=0.5, DTM_p=2)
    # retained tokens strictly fewer than F*N
    assert out.shape[1] < F_ * N
    assert out.shape[2] == C
    assert np.isfinite(np.asarray(out)).all()


def test_holitom_merge_static_collapse():
    import numpy as np
    from llmc_tpu.compression.token_reduction import holitom_merge
    rng = np.random.RandomState(2)
    F_, N, C = 4, 16, 8
    base = rng.randn(1, N, C).astype(np.float32)
    frames = jnp.asarray(np.repeat(base, F_, axis=0))
    attn = jnp.asarray(rng.rand(F_, N), jnp.float32)
    out = holitom_merge(frames, attn, tau=0.5, retain_ratio=0.25)
    # identical frames -> one static window, tokens collapse heavily
    assert out.shape[1] <= N
    assert out.shape[2] == C
    rng_frames = jnp.asarray(rng.randn(F_, N, C), jnp.float32)
    out2 = holitom_merge(rng_frames, attn, tau=0.99, retain_ratio=0.5)
    # nothing static: per-frame attention-density reduction only
    assert out2.shape[1] <= F_ * int(np.ceil(N * 0.5))
    assert np.isfinite(np.asarray(out2)).all()


def test_video_methods_wired_into_videollava():
    import numpy as np
    from llmc_tpu.models.adapter import VideoLlavaAdapter
    cfg = {'model': {'type': 'VideoLlava', 'arch': {
        'vocab_size': 72, 'hidden_size': 32, 'intermediate_size': 64,
        'num_hidden_layers': 2, 'num_attention_heads': 4,
        'num_key_value_heads': 2, 'head_dim': 8, 'dtype': 'float32',
        'image_size': 28, 'patch_size': 14, 'image_token_index': 70,
        'video_token_index': 71, 'num_frames': 4}}}
    ad = VideoLlavaAdapter.from_config(cfg)
    c = ad.llava_cfg
    rng = np.random.RandomState(3)
    span = c.num_frames * c.image_seq_length
    S = span + 6
    ids = np.full((1, S), 3, np.int32)
    ids[0, 2:2 + span] = 71
    # identical frames: temporal merging has maximal static content
    one = rng.randn(1, 1, 3, 28, 28).astype(np.float32)
    vids = np.repeat(one, 4, axis=1)
    for method, kwargs in (
            ('PruneVid', {'taus': 0.5, 'cluster_ratios': 0.5,
                          'temporal_segment_ratios': 0.25}),
            ('FastVID', {'fastvid_retention_ratio': 0.5,
                         'fastvid_DySeg_c': 2}),
            ('HoliTom', {'holitom_retain_ratio': 0.5})):
        out = ad.forward_logits(
            jnp.asarray(ids), None,
            pixel_values_videos=jnp.asarray(vids),
            token_reduction=dict({'method': method}, **kwargs))
        assert out.shape[0] == 1 and out.shape[2] == 72
        assert out.shape[1] < S, method   # sequence actually shrank


def test_fastvid_output_preserves_token_order():
    """Kept tokens must come out in original per-frame order — the
    reference argsorts keep indices before splicing (fastvid.py:546-549)."""
    import numpy as np
    from llmc_tpu.compression.token_reduction import fastvid_prune
    F_, N, C = 2, 8, 4
    # token value encodes its index: frames[f, i] = f*100 + i
    base = (np.arange(F_)[:, None] * 100
            + np.arange(N)[None, :]).astype(np.float32)
    frames = jnp.asarray(np.repeat(base[..., None], C, axis=-1))
    # saliency picks indices 5, 1, 6 (descending attn) in every frame
    attn = np.zeros((F_, N), np.float32)
    attn[:, 5], attn[:, 1], attn[:, 6] = 3, 2, 1
    glob = jnp.asarray(np.ones((F_, C), np.float32))
    out = np.asarray(fastvid_prune(
        frames, jnp.asarray(attn), glob, DySeg_c=1, DySeg_tau=-1.0,
        retention_ratio=0.375, STPrune_d=0.0, DTM_p=99))[0]
    # pure-salient config (no context): per frame exactly tokens 1,5,6
    # in ORIGINAL order
    ids = out[:, 0].astype(int)
    assert ids.tolist() == [1, 5, 6, 101, 105, 106], ids.tolist()


def test_holitom_dynamic_tokens_in_order():
    """HoliTom dynamic-token output is sorted by original position
    (holitom.py:455-462 grid-mode sort)."""
    import numpy as np
    from llmc_tpu.compression.token_reduction import holitom_merge
    rng = np.random.RandomState(0)
    F_, N, C = 2, 8, 4
    base = (np.arange(F_)[:, None] * 100
            + np.arange(N)[None, :]).astype(np.float32)
    frames = jnp.asarray(np.repeat(base[..., None], C, axis=-1)
                         + 0.001 * rng.randn(F_, N, C).astype(np.float32))
    attn = np.zeros((F_, N), np.float32)
    attn[:, 6], attn[:, 2] = 2, 1     # dominant picks 6 then 2
    # tau>1: nothing static; D=0 -> all-dominant (no context merge)
    out = np.asarray(holitom_merge(frames, jnp.asarray(attn), tau=1.5,
                                   retain_ratio=0.25, D=0.0))[0]
    ids = np.round(out[:, 0]).astype(int)
    assert ids.tolist() == [2, 6, 102, 106], ids.tolist()
