"""Golden tests for the quantizer core.

Validates numeric semantics against hand-computed values and against
torch's native float8 casts (bit-exact RNE check for e4m3/e5m2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmc_tpu.quant import (QParams, QuantSpec, fake_quant_act,
                            fake_quant_weight, fake_quant_weight_w48,
                            float_cast, minmax_range, pack_int4,
                            qparams_from_range, quant_dequant,
                            real_quant_weight, reshape_tensor, restore_tensor,
                            tensor_qparams, unpack_int4)


def test_sym_int8_qparams_exact():
    spec = QuantSpec(bit=8, symmetric=True, granularity='per_channel')
    w = jnp.array([[1.0, -2.0, 0.5], [0.25, 0.125, -0.25]])
    t, qp = tensor_qparams(spec, w)
    np.testing.assert_allclose(np.asarray(qp.scales),
                               [[2.0 / 127], [0.25 / 127]], rtol=1e-6)
    # values on the grid reconstruct near-exactly
    q = quant_dequant(spec, t, qp)
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=1e-2)


def test_asym_int4_zero_point():
    spec = QuantSpec(bit=4, symmetric=False, granularity='per_channel')
    w = jnp.array([[0.0, 15.0]])
    t, qp = tensor_qparams(spec, w)
    # scale = (15-0)/15 = 1, zero = 0 - round(0/1) = 0
    np.testing.assert_allclose(np.asarray(qp.scales), [[1.0]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.zeros), [[0.0]], atol=1e-6)
    q = quant_dequant(spec, t, qp)
    np.testing.assert_allclose(np.asarray(q), [[0.0, 15.0]], atol=1e-6)


def test_asym_negative_range():
    spec = QuantSpec(bit=8, symmetric=False, granularity='per_tensor')
    w = jnp.array([-1.0, 1.0])
    t, qp = tensor_qparams(spec, w)
    q = quant_dequant(spec, t, qp)
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=1e-2)


def test_per_group_reshape_roundtrip():
    spec = QuantSpec(bit=4, granularity='per_group', group_size=4)
    w = jnp.arange(24, dtype=jnp.float32).reshape(2, 12)
    t = reshape_tensor(spec, w)
    assert t.shape == (6, 4)
    back = restore_tensor(spec, t, w.shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(w))


def test_per_group_padding():
    spec = QuantSpec(bit=4, granularity='per_group', group_size=8)
    w = jnp.ones((2, 12), jnp.float32)
    t = reshape_tensor(spec, w)
    assert t.shape == (4, 8)
    back = restore_tensor(spec, t, w.shape)
    assert back.shape == (2, 12)


def test_per_block_reshape():
    spec = QuantSpec(bit='e4m3', granularity='per_block', block_size=2)
    w = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    t = reshape_tensor(spec, w)
    assert t.shape == (2, 2, 2, 2)
    mn, mx = minmax_range(spec, t)
    assert mx.shape == (2, 1, 2, 1)
    # block (0,0) = [[0,1],[4,5]] -> absmax 5
    assert float(mx[0, 0, 0, 0]) == 5.0
    back = restore_tensor(spec, t, (4, 4))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(w))


def test_per_head():
    spec = QuantSpec(bit=8, granularity='per_head', head_num=2)
    w = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
    t = reshape_tensor(spec, w.reshape(-1))
    assert t.shape == (2, 4)


@pytest.mark.parametrize('fmt,torch_dtype', [('e4m3', 'float8_e4m3fn'),
                                             ('e5m2', 'float8_e5m2')])
def test_float_cast_matches_torch(fmt, torch_dtype):
    import torch
    e, m = {'e4m3': (4, 3), 'e5m2': (5, 2)}[fmt]
    mx = {'e4m3': 448.0, 'e5m2': 57344.0}[fmt]
    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.randn(4096).astype(np.float32) * 10,
        rng.randn(1024).astype(np.float32) * 1e-3,   # subnormal territory
        np.array([0.0, 1.0, -1.0, 447.9, 448.0, -448.0], np.float32),
    ])
    ours = np.asarray(float_cast(jnp.asarray(x), e, m, mx))
    theirs = torch.tensor(x).to(getattr(torch, torch_dtype)).float().numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_float_cast_saturates():
    out = float_cast(jnp.array([1e6, -1e6]), 4, 3, 448.0)
    np.testing.assert_array_equal(np.asarray(out), [448.0, -448.0])


def test_mse_calib_not_worse_than_minmax():
    # The MSE grid includes p=1.0 (the minmax range) at step 0, so per row
    # the 2.4-norm error can never exceed minmax's.
    rng = np.random.RandomState(1)
    w = rng.randn(8, 64).astype(np.float32)
    w[0, 0] = 100.0  # outlier blows up the minmax scale
    minmax = QuantSpec(bit=4, symmetric=True, granularity='per_channel')
    mse = minmax.replace(calib_algo='mse')
    q_minmax = np.asarray(fake_quant_weight(minmax, jnp.asarray(w)))
    q_mse = np.asarray(fake_quant_weight(mse, jnp.asarray(w)))
    err_minmax = (np.abs(q_minmax - w) ** 2.4).sum(axis=1)
    err_mse = (np.abs(q_mse - w) ** 2.4).sum(axis=1)
    assert np.all(err_mse <= err_minmax * (1 + 1e-5))
    # and strictly better on at least one gaussian row at 4 bits
    assert err_mse.sum() < err_minmax.sum()


def test_hqq_improves_over_own_init():
    # HQQ refines the zero-points starting from the (non-rounded-zp) minmax
    # qparams; it must not be worse than that starting point.  (It is NOT
    # guaranteed to beat rounded-zp minmax — the reference behaves the same
    # way, see test_hqq_matches_reference.)
    rng = np.random.RandomState(2)
    w = (rng.randn(16, 64) ** 3).astype(np.float32)  # heavy-tailed
    init = QuantSpec(bit=4, symmetric=False, granularity='per_group',
                     group_size=32, round_zp=False)
    hqq = init.replace(calib_algo='hqq')
    q_init = np.asarray(fake_quant_weight(init, jnp.asarray(w)))
    q_hqq = np.asarray(fake_quant_weight(hqq, jnp.asarray(w)))
    assert np.abs(q_hqq - w).mean() <= np.abs(q_init - w).mean() * 1.001


def test_hqq_matches_reference():
    from ref_oracle import load_ref_module, reference_available
    if not reference_available():
        pytest.skip('reference tree not mounted')
    import torch
    ref = load_ref_module('llmc.compression.quantization.quant')
    rng = np.random.RandomState(2)
    w = (rng.randn(16, 64) ** 3).astype(np.float32)
    rq = ref.IntegerQuantizer(4, False, 'per_group', group_size=32,
                              calib_algo='hqq', round_zp=False)
    t, s, z, qmax, qmin = rq.get_tensor_qparams(torch.tensor(w))
    ref_out = rq.restore_tensor(rq.quant_dequant(t, s, z, qmax, qmin),
                                (16, 64)).numpy()
    spec = QuantSpec(bit=4, symmetric=False, granularity='per_group',
                     group_size=32, calib_algo='hqq', round_zp=False)
    ours = np.asarray(fake_quant_weight(spec, jnp.asarray(w)))
    # proximal solver is iterative; allow small fp32 drift
    assert np.abs(ours - ref_out).mean() < 2e-2
    assert abs(np.abs(ours - w).mean() - np.abs(ref_out - w).mean()) < 5e-3


def test_real_quant_roundtrip_int4():
    spec = QuantSpec(bit=4, symmetric=False, granularity='per_group',
                     group_size=32)
    rng = np.random.RandomState(3)
    w = rng.randn(8, 64).astype(np.float32)
    codes, scales, zeros = real_quant_weight(spec, jnp.asarray(w))
    assert codes.dtype == jnp.uint8
    assert scales.shape == (8, 2)
    fq = np.asarray(fake_quant_weight(spec, jnp.asarray(w)))
    # dequantize codes manually
    c = np.asarray(codes).reshape(-1, 32).astype(np.float32)
    deq = (c - np.asarray(zeros).reshape(-1, 1)) * np.asarray(
        scales).reshape(-1, 1)
    np.testing.assert_allclose(deq.reshape(8, 64), fq, rtol=1e-5, atol=1e-5)


def test_pack_unpack_int4():
    rng = np.random.RandomState(4)
    codes = rng.randint(-8, 8, size=(16, 128)).astype(np.int8)
    packed = pack_int4(jnp.asarray(codes))
    assert packed.shape == (16, 64)
    out = np.asarray(unpack_int4(packed, signed=True))
    np.testing.assert_array_equal(out, codes)
    ucodes = rng.randint(0, 16, size=(16, 128)).astype(np.int8)
    out_u = np.asarray(unpack_int4(pack_int4(jnp.asarray(ucodes)),
                                   signed=False))
    np.testing.assert_array_equal(out_u, ucodes)


def test_w48_double_quant():
    spec8 = QuantSpec(bit=8, symmetric=False, granularity='per_channel')
    spec4 = QuantSpec(bit=4, symmetric=False, granularity='per_group',
                      group_size=32)
    rng = np.random.RandomState(5)
    w = rng.randn(8, 64).astype(np.float32)
    out = np.asarray(fake_quant_weight_w48(spec8, spec4, jnp.asarray(w)))
    assert out.shape == w.shape
    assert np.abs(out - w).mean() < 0.5


def test_act_quant_per_tensor_dynamic():
    spec = QuantSpec(bit=8, symmetric=True, granularity='per_tensor')
    a = jnp.asarray(np.random.RandomState(6).randn(2, 16, 32),
                    dtype=jnp.float32)
    q = fake_quant_act(spec, a)
    assert q.shape == a.shape
    assert float(jnp.abs(q - a).max()) < float(jnp.abs(a).max()) / 64


def test_fake_quant_dim_ic():
    spec = QuantSpec(bit=8, symmetric=True, granularity='per_channel')
    w = jnp.asarray(np.random.RandomState(7).randn(8, 16), jnp.float32)
    q = fake_quant_weight(spec, w, dim_ic=True)
    assert q.shape == w.shape


def test_jit_and_grad_through_fake_quant():
    from llmc_tpu.quant import ste_round
    spec = QuantSpec(bit=4, symmetric=True, granularity='per_channel')
    w = jnp.asarray(np.random.RandomState(8).randn(4, 16), jnp.float32)

    @jax.jit
    def loss(w):
        q = fake_quant_weight(spec, w, round_fn=ste_round)
        return jnp.sum(q ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert not np.any(np.isnan(np.asarray(g)))
