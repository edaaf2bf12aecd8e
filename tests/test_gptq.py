"""GPTQ invariants: error-compensated rounding must beat plain RTN on the
calibration distribution, and the pipeline must preserve FP at
'transformed' (GPTQ writes compensated FP weights, not qdq)."""

import numpy as np
import pytest

import jax.numpy as jnp

from test_pipeline import tiny_config, run


def _make_gptq(wcfg_special=None):
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    cfg = Cfg(tiny_config('GPTQ', wbit=4,
                          special=wcfg_special or {'actorder': False}))
    model = build_model(cfg)
    algo = ALGO_REGISTRY['GPTQ'](model, cfg['quant'],
                                 {'data': [], 'kwargs': []}, None, cfg)
    return algo


def test_gptq_layer_beats_rtn():
    from llmc_tpu.quant import QuantSpec, fake_quant_weight
    algo = _make_gptq()
    rng = np.random.RandomState(0)
    oc, C, T = 32, 64, 256
    W = rng.randn(oc, C).astype(np.float32)
    X = (rng.randn(T, C) * (1 + 3 * rng.rand(C))).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    lin = {'w': jnp.asarray(W), 'b': None}
    new = algo.layer_transform(lin, H)
    assert 'gptq_scales' in new
    Wq_gptq = np.asarray(algo.static_w_qdq(new))
    spec = algo.wspec
    Wq_rtn = np.asarray(fake_quant_weight(spec, jnp.asarray(W)))
    err_gptq = ((X @ (Wq_gptq - W).T) ** 2).mean()
    err_rtn = ((X @ (Wq_rtn - W).T) ** 2).mean()
    assert err_gptq < err_rtn


def test_gptq_actorder_runs():
    algo = _make_gptq({'actorder': True})
    rng = np.random.RandomState(1)
    W = rng.randn(16, 64).astype(np.float32)
    X = (rng.randn(128, 64) * (1 + 5 * rng.rand(64))).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    assert 'perm' in new
    Wq = np.asarray(algo.static_w_qdq(new))
    assert Wq.shape == W.shape and np.isfinite(Wq).all()


def test_gptq_owq_outliers_stay_fp():
    """OWQ: the n_out highest-sensitivity columns must come back from
    static_w_qdq exactly equal to the compensated FP weight (no qdq),
    while the rest actually quantize."""
    algo = _make_gptq({'owq': True, 'n_outs': 4})
    rng = np.random.RandomState(2)
    oc, C = 16, 64
    W = rng.randn(oc, C).astype(np.float32)
    scale_cols = np.ones(C, np.float32)
    scale_cols[[3, 17, 40, 63]] = 30.0  # dominant-sensitivity columns
    X = (rng.randn(256, C) * scale_cols).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    assert new['owq_n_out'] == 4 and 'perm' in new
    perm = np.asarray(new['perm'])
    assert set(perm[-4:]) == {3, 17, 40, 63}
    Wq = np.asarray(algo.static_w_qdq(new))
    Wt = np.asarray(new['w'])  # compensated FP (original column order)
    np.testing.assert_array_equal(Wq[:, perm[-4:]], Wt[:, perm[-4:]])
    other = perm[:-4]
    assert np.abs(Wq[:, other] - Wt[:, other]).max() > 0


def test_gptq_owq_actorder_beats_plain_owq_none():
    """OWQ + actorder runs and quantized output error (on calib data)
    is no worse than GPTQ without outlier protection."""
    from llmc_tpu.quant import fake_quant_weight
    rng = np.random.RandomState(3)
    oc, C, T = 16, 64, 256
    W = rng.randn(oc, C).astype(np.float32)
    scale_cols = 1 + 10 * (rng.rand(C) ** 4)
    X = (rng.randn(T, C) * scale_cols).astype(np.float32)

    def err_of(special):
        algo = _make_gptq(special)
        H = algo._hessian([jnp.asarray(X)])
        new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
        Wq = np.asarray(algo.static_w_qdq(new))
        return ((X @ (Wq - W).T) ** 2).mean()

    e_owq = err_of({'owq': True, 'n_outs': 8, 'actorder': True})
    e_plain = err_of({'actorder': True})
    assert np.isfinite(e_owq) and e_owq <= e_plain * 1.05


def test_gptq_pipeline():
    res = run(tiny_config('GPTQ', wbit=4,
                          special={'actorder': True, 'percdamp': 0.01},
                          extra={'quant_extra': None}))
    # transformed keeps compensated FP weights -> close to pretrain but
    # not identical (compensation shifts weights slightly)
    assert res['ppl_transformed'] < res['ppl_pretrain'] * 1.2
    assert res['ppl_fake_quant'] < res['ppl_pretrain'] * 1.5


def test_gptq_quant_out_pipeline():
    cfg = tiny_config('GPTQ', wbit=4, special={'actorder': False})
    cfg['quant']['quant_out'] = True
    res = run(cfg)
    assert np.isfinite(res['ppl_fake_quant'])


def test_gptq_static_groups_actorder():
    """static_groups + actorder (gptq.py:225-227): group qparams come
    from the original column order; the deployed qdq must quantize each
    column with its original group's scale regardless of the loop's
    permutation, and error-compensation must still beat plain RTN."""
    from llmc_tpu.quant import QuantSpec, fake_quant_weight
    algo = _make_gptq({'static_groups': True, 'actorder': True,
                       'blocksize': 16})
    rng = np.random.RandomState(4)
    oc, C, T = 16, 64, 256
    W = rng.randn(oc, C).astype(np.float32)
    X = (rng.randn(T, C) * (1 + 5 * rng.rand(C))).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    assert 'perm' in new and 'gptq_scales' in new
    gs = algo.wspec.group_size
    # stored scales == per-original-group qparams of the original W? No —
    # of the error-compensated W's original groups is not recomputable
    # here; instead verify deploy ignores the perm (per-column indep.)
    Wq = np.asarray(algo.static_w_qdq(new))
    no_perm = {k: v for k, v in new.items() if k != 'perm'}
    Wq2 = np.asarray(algo.static_w_qdq(no_perm))
    np.testing.assert_array_equal(Wq, Wq2)
    err_gptq = ((X @ (Wq - W).T) ** 2).mean()
    Wq_rtn = np.asarray(fake_quant_weight(algo.wspec, jnp.asarray(W)))
    err_rtn = ((X @ (Wq_rtn - W).T) ** 2).mean()
    assert np.isfinite(err_gptq) and err_gptq < err_rtn


def test_gptq_static_actorder_pipeline():
    res = run(tiny_config('GPTQ', wbit=4,
                          special={'static_groups': True,
                                   'actorder': True, 'percdamp': 0.01},
                          extra={'quant_extra': None}))
    assert np.isfinite(res['ppl_fake_quant'])


def test_gptq_static_groups_blocksize_spanning_groups():
    """static_groups without actorder with blocksize (128) > group_size
    (32): every group's qparams must be applied to its own columns and
    all scales_out entries filled — regression for the bug where only the
    first group per column block was used and the rest were zeroed by
    static_w_qdq."""
    algo = _make_gptq({'static_groups': True, 'actorder': False})
    assert algo.blocksize == 128
    rng = np.random.RandomState(4)
    oc, C = 16, 128  # one column block spanning 4 groups of 32
    W = rng.randn(oc, C).astype(np.float32)
    X = (rng.randn(256, C) * (1 + 2 * rng.rand(C))).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    scales = np.asarray(new['gptq_scales'])
    assert scales.shape == (oc, C // 32)
    assert (np.abs(scales) > 0).all(), 'unfilled group scales'
    Wq = np.asarray(algo.static_w_qdq(new))
    assert not (Wq == 0).all(axis=0).any(), 'zeroed columns'
    mse = ((Wq - W) ** 2).mean()
    assert mse < 0.01, mse  # 4-bit per-group error, not garbage


def test_gptq_static_groups_matches_group_aligned_blocksize():
    """With blocksize=group_size the old path was correct; the spanning
    path must produce identical results (per-column independence of
    static group qparams)."""
    a128 = _make_gptq({'static_groups': True, 'actorder': False,
                       'blocksize': 128})
    a32 = _make_gptq({'static_groups': True, 'actorder': False,
                      'blocksize': 32})
    rng = np.random.RandomState(5)
    oc, C = 8, 128
    W = rng.randn(oc, C).astype(np.float32)
    X = (rng.randn(128, C) * (1 + 2 * rng.rand(C))).astype(np.float32)
    H = a128._hessian([jnp.asarray(X)])
    n128 = a128.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    n32 = a32.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    np.testing.assert_allclose(np.asarray(n128['gptq_scales']),
                               np.asarray(n32['gptq_scales']), atol=0)
    np.testing.assert_allclose(np.asarray(a128.static_w_qdq(n128)),
                               np.asarray(a32.static_w_qdq(n32)),
                               atol=2e-5)
