"""Fused dequant-matmul: packing roundtrip + pallas-interpret vs XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_tpu.ops.dequant_matmul import (QMeta, _dequant_matmul_xla_a8,
                                         dequant_matmul,
                                         dequant_matmul_pallas,
                                         dequant_weight_xla, pack_scales_t,
                                         pack_weight, unpack_weight_xla)


def _mk(bits=4, sym=False, N=128, K=256, gs=128, seed=0):
    rng = np.random.RandomState(seed)
    lo, hi = (-(2 ** (bits - 1)), 2 ** (bits - 1) - 1) if sym \
        else (0, 2 ** bits - 1)
    codes = rng.randint(lo, hi + 1, size=(N, K)).astype(np.int8)
    scales = (0.01 + rng.rand(N, K // gs)).astype(np.float32) * 0.02
    zeros = None if sym else rng.randint(lo, hi + 1, (N, K // gs)) \
        .astype(np.float32)
    meta = QMeta(bits=bits, group_size=gs, symmetric=sym,
                 out_features=N, in_features=K)
    packed, s, z = pack_weight(jnp.asarray(codes), jnp.asarray(scales),
                               jnp.asarray(zeros) if zeros is not None
                               else None, meta)
    return codes, scales, zeros, packed, s, z, meta


@pytest.mark.parametrize('sym', [True, False])
def test_pack_unpack_roundtrip(sym):
    codes, scales, zeros, packed, s, z, meta = _mk(sym=sym)
    rec = np.asarray(unpack_weight_xla(packed, meta))
    if sym:
        np.testing.assert_array_equal(rec, codes.astype(np.float32))
    else:
        np.testing.assert_array_equal(rec, (codes.astype(np.int32) & 0xF)
                                      .astype(np.float32))


@pytest.mark.parametrize('sym', [True, False])
def test_dequant_weight_matches_manual(sym):
    codes, scales, zeros, packed, s, z, meta = _mk(sym=sym)
    w = np.asarray(dequant_weight_xla(packed, s, z, meta))
    c = codes.astype(np.float32) if sym else (codes.astype(np.int32)
                                              & 0xF).astype(np.float32)
    gs = meta.group_size
    cg = c.reshape(meta.out_features, -1, gs)
    if zeros is not None:
        cg = cg - zeros[:, :, None]
    ref = (cg * scales[:, :, None]).reshape(c.shape)
    np.testing.assert_allclose(w, ref, rtol=1e-6)


@pytest.mark.parametrize('sym', [True, False])
def test_pallas_interpret_matches_xla(sym):
    codes, scales, zeros, packed, s, z, meta = _mk(sym=sym, N=128, K=256,
                                                   gs=128)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 256)
                    .astype(np.float32) * 0.1)
    ref = np.asarray(dequant_matmul(x, packed, s, z, meta,
                                    force_xla=True))
    got = np.asarray(dequant_matmul_pallas(
        x.astype(jnp.bfloat16), packed, s, z, meta,
        tm=16, tn=128, interpret=True))
    # bf16 inputs in the kernel: compare loosely
    rel = np.abs(got.astype(np.float32) - ref).max() / \
        (np.abs(ref).max() + 1e-9)
    assert rel < 0.03


def test_int8_kernel_interpret():
    codes, scales, zeros, packed, s, z, meta = _mk(bits=8, sym=True,
                                                   N=128, K=256, gs=128)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 256)
                    .astype(np.float32) * 0.1)
    ref = np.asarray(dequant_matmul(x, packed, s, z, meta,
                                    force_xla=True))
    got = np.asarray(dequant_matmul_pallas(
        x.astype(jnp.bfloat16), packed, s, z, meta, tm=16, tn=128,
        interpret=True))
    rel = np.abs(got.astype(np.float32) - ref).max() / \
        (np.abs(ref).max() + 1e-9)
    assert rel < 0.03


def test_packed_serving_engine_cpu_fallback():
    """pack_model + ServingEngine end-to-end (XLA path on CPU)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import Request, ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=0)
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    qmap = pack_model(m, wspec)
    eng = ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                        prefill_buckets=(8, 16))
    rng = np.random.RandomState(0)
    reqs = [Request(uid=i, prompt_ids=rng.randint(0, 128, (5 + i,)),
                    max_new_tokens=5) for i in range(3)]
    eng.run(reqs)
    assert all(r.done and len(r.output_ids) == 5 for r in reqs)


@pytest.mark.parametrize('sym', [True, False])
def test_pre_t_matches_legacy(sym):
    """Pre-transposed folded scales (serving layout) must match the
    legacy [N, ng] layout on both the interpret-kernel and XLA paths."""
    from llmc_tpu.ops.dequant_matmul import pack_scales_t
    import dataclasses
    codes, scales, zeros, packed, s, z, meta = _mk(sym=sym, N=128, K=512,
                                                   gs=128)
    st, zst = pack_scales_t(s, z, meta)
    assert st.shape == (4, 128) and zst.shape == (4, 128)
    meta_t = dataclasses.replace(meta, pre_t=True)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 512)
                    .astype(np.float32) * 0.1)
    ref = np.asarray(dequant_matmul(x, packed, s, z, meta,
                                    force_xla=True))
    got_xla = np.asarray(dequant_matmul(x, packed, st, zst, meta_t,
                                        force_xla=True))
    np.testing.assert_allclose(got_xla, ref, rtol=2e-5, atol=1e-5)
    legacy = np.asarray(dequant_matmul_pallas(
        x.astype(jnp.bfloat16), packed, s, z, meta, tm=16, tn=128,
        interpret=True))
    got = np.asarray(dequant_matmul_pallas(
        x.astype(jnp.bfloat16), packed, st, zst, meta_t, tm=16, tn=128,
        interpret=True))
    np.testing.assert_allclose(got.astype(np.float32),
                               legacy.astype(np.float32), rtol=1e-5,
                               atol=1e-5)


def test_fused_packed_decode_matches_unfused():
    """qkv/gate_up fusion + pre_t serving layout: greedy decode tokens
    must match the unfused packed model exactly."""
    import numpy as np
    from llmc_tpu.models import LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.decode import greedy_generate
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.models import LlamaAdapter
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    ids = np.random.RandomState(0).randint(0, 128, (1, 6))
    m1 = LlamaAdapter.random(cfg, seed=0)
    q1 = pack_model(m1, wspec, fuse=False, pre_t=False)
    out1 = greedy_generate(m1, jnp.asarray(ids), max_new_tokens=6,
                           qmap=q1)
    m2 = LlamaAdapter.random(cfg, seed=0)
    q2 = pack_model(m2, wspec, fuse=True, pre_t=True)
    assert 'qkv_proj' in m2.blocks[0]['self_attn']
    assert 'gate_up_proj' in m2.blocks[0]['mlp']
    out2 = greedy_generate(m2, jnp.asarray(ids), max_new_tokens=6,
                           qmap=q2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_packed_lm_head_logits():
    """pack_head: packed-head logits must equal the explicit
    dequantize-then-matmul reference bit-for-bit (f32, CPU XLA path),
    and stay close to the fp head (w4 weight-only quality)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.models.llama import head_apply
    from llmc_tpu.ops.dequant_matmul import dequant_weight_xla
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=0)
    w_fp = np.asarray(m.params['lm_head']['w'], np.float32)
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 64)
                    .astype(np.float32) * 0.3)
    qmap = pack_model(m, wspec, pre_t=False, head=True)
    head = m.params['lm_head']
    assert 'qweight' in head and qmap.get('lm_head') is not None
    got = np.asarray(head_apply(m.params, cfg, x, qmap=qmap))
    meta = qmap.get('lm_head').qmeta
    w_dq = dequant_weight_xla(head['qweight'], head['scales'],
                              head.get('zeros'), meta)
    # same normed hidden state the head sees
    from llmc_tpu.models.base import rms_norm
    h = np.asarray(rms_norm(x, m.params['norm']['w'], cfg.rms_norm_eps))
    ref = h.reshape(-1, 64) @ np.asarray(w_dq, np.float32).T
    np.testing.assert_allclose(got.reshape(-1, 256), ref, rtol=1e-5,
                               atol=1e-5)
    # quality: w4 head logits track the fp head
    fp = h.reshape(-1, 64) @ w_fp.T
    rel = np.abs(ref - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.2, rel  # random-normal weights, K=64/gs=32 (worst case)
    # pre_t serving layout gives the same logits
    m2 = LlamaAdapter.random(cfg, seed=0)
    q2 = pack_model(m2, wspec, pre_t=True, head=True)
    got2 = np.asarray(head_apply(m2.params, cfg, x, qmap=q2))
    np.testing.assert_allclose(got2, got, rtol=2e-5, atol=2e-5)


def test_packed_head_decode_matches_dense_head_tokens():
    """Greedy decode with the packed w8 head produces the same tokens as
    the explicitly-dequantized dense head (exact path, CPU)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.ops.dequant_matmul import dequant_weight_xla
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.decode import greedy_generate
    from llmc_tpu.serve.packed import pack_model
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    wspec = QuantSpec(bit=8, symmetric=True, granularity='per_group',
                      group_size=32)
    ids = np.random.RandomState(0).randint(0, 128, (2, 6))
    m1 = LlamaAdapter.random(cfg, seed=0)
    q1 = pack_model(m1, wspec, head=True)
    out1 = greedy_generate(m1, jnp.asarray(ids), max_new_tokens=6,
                           qmap=q1)
    m2 = LlamaAdapter.random(cfg, seed=0)
    q2 = pack_model(m2, wspec, head=False)
    hd = m1.params['lm_head']
    w_dq = dequant_weight_xla(hd['qweight'], hd['scales'],
                              hd.get('zeros'), q1.get('lm_head').qmeta)
    m2.params['lm_head'] = {'w': jnp.asarray(w_dq, jnp.float32),
                            'b': None}
    out2 = greedy_generate(m2, jnp.asarray(ids), max_new_tokens=6,
                           qmap=q2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestW4A8:
    """W4A8 int8-MXU path (r5): per-token dynamic int8 activations
    through the int8 dot kernel.  Reference scope: llmc's w4a8 configs
    (e.g. QuaRot/DGQ w4a8, quant.py per-token dynamic a_qcfg)."""

    def _mk(self, M=24, K=256, N=96, gs=64, sym=True, pre_t=False,
            seed=0):
        rng = np.random.default_rng(seed)
        meta = QMeta(bits=4, group_size=gs, symmetric=sym,
                     out_features=N, in_features=K, pre_t=pre_t)
        lo = -8 if sym else 0
        codes = jnp.asarray(rng.integers(lo, lo + 16, (N, K)))
        scales = jnp.asarray(rng.uniform(.005, .02, (N, K // gs)),
                             jnp.float32)
        zeros = (None if sym else jnp.asarray(
            rng.integers(0, 16, (N, K // gs)), jnp.float32))
        packed, s, z = pack_weight(codes, scales, zeros, meta)
        if pre_t:
            s, z = pack_scales_t(scales, zeros, meta)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
        return x, packed, s, z, meta, codes, scales, zeros

    @pytest.mark.parametrize('sym', [True, False])
    def test_kernel_matches_xla_a8(self, sym):
        """Pallas interpret == the XLA a8 emulation (same math)."""
        x, packed, s, z, meta, *_ = self._mk(sym=sym)
        want = _dequant_matmul_xla_a8(x, packed, s, z, meta,
                                      out_dtype=jnp.float32)
        got = dequant_matmul_pallas(x, packed, s, z, meta,
                                    interpret=True, a_int8=True,
                                    out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_kernel_pre_t_matches_plain_a8(self):
        """pre_t scale folding is layout-only: the a8 kernel must give
        identical results with either scale storage (the a16 kernel is
        NOT an exact oracle here — it casts inputs to bf16)."""
        x, packed, s, z, meta, codes, scales, zeros = self._mk(
            pre_t=True)
        got = dequant_matmul_pallas(x, packed, s, z, meta,
                                    interpret=True, a_int8=True,
                                    out_dtype=jnp.float32)
        import dataclasses
        meta_p = dataclasses.replace(meta, pre_t=False)
        packed_p, s_p, z_p = pack_weight(codes, scales, zeros, meta_p)
        base = dequant_matmul_pallas(x, packed_p, s_p, z_p, meta_p,
                                     interpret=True, a_int8=True,
                                     out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_a8_close_to_a16(self):
        """int8 activations add ~1/127 relative noise — outputs stay
        close to the W4A16 path on well-scaled inputs."""
        x, packed, s, z, meta, *_ = self._mk(M=16, K=512, N=128, gs=128)
        a16 = dequant_matmul(x, packed, s, z, meta, force_xla=True,
                             out_dtype=jnp.float32)
        a8 = dequant_matmul(x, packed, s, z, meta, force_xla=True,
                            a_int8=True, out_dtype=jnp.float32)
        denom = np.abs(np.asarray(a16)).mean() + 1e-9
        rel = np.abs(np.asarray(a8 - a16)).mean() / denom
        assert rel < 0.02, rel

    def test_linear_apply_a8_wiring(self):
        """LinearQcfg(a_int8=True) routes through the a8 path."""
        from llmc_tpu.models.base import LinearQcfg, linear_apply
        x, packed, s, z, meta, *_ = self._mk()
        p = {'qweight': packed, 'scales': s, 'b': None}
        if z is not None:
            p['zeros'] = z
        qc = LinearQcfg(w_packed=True, qmeta=meta, a_int8=True)
        y = linear_apply(p, x[None], qc)
        want = dequant_matmul(x, packed, s, z, meta, a_int8=True)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_packed_serving_engine_w4a8_cpu():
    """pack_model(a_int8=True) + ServingEngine: the W4A8 serving path
    end-to-end (XLA a8 emulation on CPU).  Tokens must largely agree
    with the W4A16 engine on a tiny model (per-token int8 acts add
    ~1/127 noise)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import Request, ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 128, (5 + i,)) for i in range(3)]
    outs = {}
    for a8 in (False, True):
        m = LlamaAdapter.random(cfg, seed=0)
        qmap = pack_model(m, wspec, a_int8=a8)
        eng = ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                            prefill_buckets=(8, 16))
        reqs = [Request(uid=i, prompt_ids=p, max_new_tokens=5)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        assert all(r.done and len(r.output_ids) == 5 for r in reqs)
        outs[a8] = [list(r.output_ids) for r in reqs]
    n_tok = sum(len(o) for o in outs[False])
    n_same = sum(a == b for x, y in zip(outs[False], outs[True])
                 for a, b in zip(x, y))
    assert n_same >= n_tok - 3, (outs, n_same, n_tok)


def test_a8_staged_close_to_a8():
    """Per-channel int8 weight staging (prefill fast path) adds <= half
    a per-channel int8 step of weight error on top of w4."""
    from llmc_tpu.ops.dequant_matmul import (_dequant_matmul_a8_staged,
                                             _dequant_matmul_xla_a8)
    codes, scales, zeros, packed, s, z, meta = _mk(sym=True, N=128,
                                                   K=512, gs=128)
    x = jnp.asarray(np.random.RandomState(5).randn(32, 512), jnp.float32)
    base = np.asarray(_dequant_matmul_xla_a8(x, packed, s, z, meta,
                                             out_dtype=jnp.float32))
    got = np.asarray(_dequant_matmul_a8_staged(x, packed, s, z, meta,
                                               out_dtype=jnp.float32))
    rel = np.abs(got - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel < 0.01, rel


def test_engine_prefill_w8_companion():
    """ServingEngine(prefill_w8=True): prefills ride the per-channel
    int8 companion copy; tokens must largely match the plain w4 engine
    (w8-per-channel adds sub-w4-step weight noise)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import Request, ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 128, (5 + i,)) for i in range(3)]
    outs = {}
    for w8 in (False, True):
        m = LlamaAdapter.random(cfg, seed=0)
        qmap = pack_model(m, wspec, fuse=True, w8_prefill=w8)
        if w8:
            blk = m.blocks[0]['self_attn']['qkv_proj']
            assert 'qweight8' in blk and blk['qweight8'].shape == \
                blk['qweight'].shape[:1] + (64,)
        eng = ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                            prefill_buckets=(8, 16), prefill_w8=w8)
        reqs = [Request(uid=i, prompt_ids=p, max_new_tokens=5)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        assert all(r.done and len(r.output_ids) == 5 for r in reqs)
        outs[w8] = [list(r.output_ids) for r in reqs]
    n_tok = sum(len(o) for o in outs[False])
    n_same = sum(a == b for x, y in zip(outs[False], outs[True])
                 for a, b in zip(x, y))
    assert n_same >= n_tok - 3, (outs, n_same, n_tok)


def test_engine_decode_w8():
    """ServingEngine(decode_w8=True): decode (and prefill) ride the
    per-channel int8 companion — full W8A8 serving.  Tokens must
    largely match the plain w4 engine (per-channel int8 weight noise
    is below the w4 grid except for extreme in-group spread)."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import Request, ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=32)
    rng = np.random.RandomState(1)
    prompts = [rng.randint(0, 128, (5 + i,)) for i in range(3)]
    outs = {}
    for w8 in (False, True):
        m = LlamaAdapter.random(cfg, seed=0)
        qmap = pack_model(m, wspec, fuse=True, w8_prefill=w8)
        eng = ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                            prefill_buckets=(8, 16), decode_w8=w8)
        reqs = [Request(uid=i, prompt_ids=p, max_new_tokens=6)
                for i, p in enumerate(prompts)]
        eng.run(reqs)
        assert all(r.done and len(r.output_ids) == 6 for r in reqs)
        outs[w8] = [list(r.output_ids) for r in reqs]
    n_tok = sum(len(o) for o in outs[False])
    n_same = sum(a == b for x, y in zip(outs[False], outs[True])
                 for a, b in zip(x, y))
    assert n_same >= n_tok - 4, (outs, n_same, n_tok)


def test_engine_decode_w8_requires_companion():
    """decode_w8=True without the packed companion fails at
    construction with the same clear message as prefill_w8."""
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=0)
    qmap = pack_model(m, QuantSpec(bit=4, symmetric=True,
                                   granularity='per_group',
                                   group_size=32))   # no companion
    with pytest.raises(ValueError, match='w8 companion'):
        ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                      prefill_buckets=(8,), decode_w8=True)


def test_engine_prefill_w8_requires_companion():
    """prefill_w8=True without pack_model(w8_prefill=True) must fail at
    engine CONSTRUCTION with a clear message, not a KeyError at the
    first admission."""
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.quant import QuantSpec
    from llmc_tpu.serve.packed import pack_model
    from llmc_tpu.serve.engine import ServingEngine
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=0)
    qmap = pack_model(m, QuantSpec(bit=4, symmetric=True,
                                   granularity='per_group',
                                   group_size=32))   # no companion
    with pytest.raises(ValueError, match='w8 companion'):
        ServingEngine(m, qmap=qmap, max_batch=2, max_len=48,
                      prefill_buckets=(8,), prefill_w8=True)
