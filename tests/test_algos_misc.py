"""Tests for Quarot / HQQ / AdaDim / LlmInt8 / OsPlus / sparsification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_pipeline import tiny_config, run


def test_quarot_rotation_preserves_function():
    cfg = tiny_config('Quarot', wbit=4,
                      special={'rotate_mode': 'hadamard'})
    res = run(cfg)
    # rotation is an exact equivalence for weightless-RMSNorm models; the
    # only non-equivalence is embed-mean removal (small effect)
    assert abs(res['ppl_transformed'] - res['ppl_pretrain']) \
        / res['ppl_pretrain'] < 0.05
    assert np.isfinite(res['ppl_fake_quant'])


def test_hadamard_orthogonality():
    from llmc_tpu.ops.hadamard import (fwht, get_rotation, matmul_hadU,
                                       random_hadamard_matrix)
    # fwht equals the Sylvester Hadamard matrix product
    from scipy.linalg import hadamard
    x = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    ours = np.asarray(fwht(jnp.asarray(x)))
    ref = x @ hadamard(16).astype(np.float32) / np.sqrt(16)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # non-power-of-2 via Paley factor (n = 12 * 4)
    Q = np.asarray(random_hadamard_matrix(48, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(Q @ Q.T, np.eye(48), atol=1e-4)
    # random orthogonal fallback
    Q = np.asarray(get_rotation(24 * 43, jax.random.PRNGKey(1),
                                'hadamard'))
    np.testing.assert_allclose(Q @ Q.T, np.eye(24 * 43), atol=1e-3)


def test_hqq_pipeline():
    res = run(tiny_config('HQQ', wbit=4,
                          special={'lp_norm': 0.7, 'beta': 10.0,
                                   'kappa': 1.01, 'iters': 20, 'axis': 1}))
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-6)
    assert np.isfinite(res['ppl_fake_quant'])


def test_adadim_pipeline():
    res = run(tiny_config('AdaDim', wbit=4))
    assert np.isfinite(res['ppl_fake_quant'])


def test_llmint8_pipeline():
    res = run(tiny_config('LlmInt8', wbit=8,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'},
                          special={'threshold': 6.0}))
    assert res['ppl_fake_quant'] < res['ppl_pretrain'] * 1.1


def test_osplus_preserves_fp():
    res = run(tiny_config('OsPlus', wbit=8,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'},
                          special={'os_grid': 20}))
    # shift(None for no-bias llama)+scale are equivalence transforms
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-3)


def _sparse_config(method, extra_special=None):
    cfg = tiny_config('RTN')
    del cfg['quant']
    cfg['sparse'] = {'method': method,
                     'weight': {'sparsity': 0.3}}
    if extra_special:
        cfg['sparse']['special'] = extra_special
    cfg['eval']['eval_pos'] = ['pretrain', 'transformed']
    return cfg


def test_wanda_sparsifies():
    from llmc_tpu.main import run_pipeline
    res = run_pipeline(_sparse_config('Wanda'))
    m = res['model']
    w = np.asarray(m.blocks[0]['mlp']['gate_proj']['w'])
    frac_zero = (w == 0).mean()
    assert 0.25 < frac_zero < 0.35
    assert np.isfinite(res['ppl_transformed'])


def test_magnitude_sparsifies():
    from llmc_tpu.main import run_pipeline
    res = run_pipeline(_sparse_config('Magnitude'))
    w = np.asarray(res['model'].blocks[0]['self_attn']['q_proj']['w'])
    assert (w == 0).mean() > 0.25


def test_shortgpt_removes_layers():
    from llmc_tpu.main import run_pipeline
    res = run_pipeline(_sparse_config('ShortGPT',
                                      {'n_prune_layers': 1}))
    model, opt = res['model'], res['opt']
    # the reference removes layers at deploy('origin_float') ahead of the
    # transformed eval (eval/utils.py:83-84) — the pipeline already pruned
    assert model.n_blocks == 1
    # deploy is idempotent: a second call must not prune again
    assert opt.deploy() == []
    assert model.n_blocks == 1
    ids = jnp.zeros((1, 4), jnp.int32)
    assert np.isfinite(np.asarray(model.forward_logits(ids))).all()


def test_llmint8_outlier_masking_unit():
    """The outlier column must stay FP in act AND weight, and int qparams
    must come from non-outlier columns only — an x with one huge column
    should quantize the small columns as finely as if the outlier were
    absent (llmint8.py reference semantics)."""
    import jax.numpy as jnp
    from llmc_tpu.models.base import LinearQcfg, linear_apply
    from llmc_tpu.quant import QuantSpec
    rng = np.random.RandomState(0)
    C, O, T = 32, 16, 64
    x = rng.randn(1, T, C).astype(np.float32)
    x[..., 5] *= 120.0  # outlier column
    w = rng.randn(O, C).astype(np.float32)
    p = {'w': jnp.asarray(w), 'b': None}
    aspec = QuantSpec(bit=8, symmetric=True, granularity='per_token')
    wspec = QuantSpec(bit=8, symmetric=True, granularity='per_channel')
    qc = LinearQcfg(w_spec=wspec, a_spec=aspec, a_outlier_threshold=6.0)
    y = np.asarray(linear_apply(p, jnp.asarray(x), qc))
    y_fp = x @ w.T
    # reference error: quantize x/w with the outlier REMOVED, add its FP
    # contribution back
    x_no = x.copy(); x_no[..., 5] = 0.0
    from llmc_tpu.quant.quantizer import fake_quant_act, fake_quant_weight
    xq = np.asarray(fake_quant_act(aspec, jnp.asarray(x_no)))
    wq = np.asarray(fake_quant_weight(wspec, jnp.asarray(w))).copy()
    wq[:, 5] = w[:, 5]
    y_ref = xq @ wq.T + np.einsum('btc,oc->bto', x - x_no, w)
    err = np.abs(y - y_fp).mean()
    err_ref = np.abs(y_ref - y_fp).mean() + 1e-6
    # masked decomposition must be in the same error regime as the
    # outlier-free reference (the old unmasked path was ~100x worse)
    assert err < 3 * err_ref, (err, err_ref)
