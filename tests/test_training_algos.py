"""Training-based and remaining algorithms: OmniQuant, NormTweaking,
TesseraQ, QUIK, DGQ, SpQR — pipeline smoke + improvement invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from test_pipeline import tiny_config, run


def test_omniquant_lwc_improves_or_matches():
    base = run(tiny_config('RTN', wbit=3))
    omni = run(tiny_config('OmniQuant', wbit=3,
                           special={'lwc': True, 'let': False,
                                    'epochs': 5, 'lwc_lr': 5e-3}))
    assert omni['ppl_fake_quant'] <= base['ppl_fake_quant'] * 1.02


def test_omniquant_let_preserves_then_quantizes():
    res = run(tiny_config('OmniQuant', wbit=4,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'},
                          special={'lwc': True, 'let': True,
                                   'epochs': 3}))
    assert np.isfinite(res['ppl_fake_quant'])


def test_ntweak_runs():
    res = run(tiny_config('NormTweaking', wbit=3,
                          special={'epochs': 3, 'tweak_lr': 1e-4}))
    assert np.isfinite(res['ppl_fake_quant'])


def test_tesseraq_improves_or_matches_rtn():
    base = run(tiny_config('RTN', wbit=3))
    tq = run(tiny_config('TesseraQ', wbit=3,
                         special={'iterations': 10, 'lr': 1e-3,
                                  'thresholds': [0.75, 0.5, 0.25],
                                  'weight_clip': False}))
    assert tq['ppl_fake_quant'] <= base['ppl_fake_quant'] * 1.02


def test_quik_pipeline():
    res = run(tiny_config('QUIK', wbit=4,
                          act={'bit': 8, 'symmetric': True,
                               'granularity': 'per_token'},
                          special={'fp_relative': False, 'fp_features': 8,
                                   'fp_threshold': 0.0}))
    # mixed-precision columns must be finite and close-ish to fp
    assert np.isfinite(res['ppl_fake_quant'])
    assert res['ppl_transformed'] == pytest.approx(res['ppl_pretrain'],
                                                   rel=1e-6)


def test_dgq_pipeline():
    cfg = tiny_config('DGQ', wbit=4,
                      act={'bit': 8, 'symmetric': True,
                           'granularity': 'per_token'})
    cfg['quant']['weight'] = {
        'w_1': {'bit': 4, 'symmetric': False, 'granularity': 'per_group',
                'group_size': 16},
        'w_2': {'bit': 8, 'symmetric': True, 'granularity': 'per_channel'},
        'bit': 4, 'symmetric': False, 'granularity': 'per_group',
        'group_size': 16,
    }
    res = run(cfg)
    assert np.isfinite(res['ppl_fake_quant'])


def test_spqr_beats_gptq_at_low_bits():
    gptq = run(tiny_config('GPTQ', wbit=3, special={'actorder': False}))
    spqr = run(tiny_config('SpQR', wbit=3,
                           special={'actorder': False,
                                    'relative_threshold': 0.2,
                                    'simplified_outliers': True,
                                    'percdamp': 0.01}))
    # FP outliers can only help on the calib distribution
    assert spqr['ppl_fake_quant'] <= gptq['ppl_fake_quant'] * 1.05


def test_spqr_mask_nonempty():
    from llmc_tpu.utils import Cfg, ALGO_REGISTRY
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    cfg = Cfg(tiny_config('SpQR', wbit=3,
                          special={'actorder': False,
                                   'relative_threshold': 0.1,
                                   'simplified_outliers': True}))
    model = build_model(cfg)
    algo = ALGO_REGISTRY['SpQR'](model, cfg['quant'],
                                 {'data': [], 'kwargs': []}, None, cfg)
    rng = np.random.RandomState(0)
    W = (rng.randn(16, 32) ** 3).astype(np.float32)
    X = rng.randn(64, 32).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    assert 'spqr_mask' in new
    frac = float(np.asarray(new['spqr_mask']).mean())
    assert 0 < frac < 0.5
