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


def test_omniquant_qkt_smoothing_exact_on_qkt():
    """qkt_smooth_scale (reference omniq.py:329-339,659-674): scaling q
    rows down and k rows up by s must leave q·kᵀ (pre-rope) unchanged,
    and the learnable enters theta when shapes match."""
    import jax
    import jax.numpy as jnp
    from llmc_tpu.utils import ALGO_REGISTRY, Cfg
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    raw = tiny_config('OmniQuant', wbit=4,
                      special={'let': True, 'lwc': False, 'epochs': 1})
    raw['model']['arch']['num_key_value_heads'] = \
        raw['model']['arch']['num_attention_heads']  # qkt needs q==k dims
    cfg = Cfg(raw)
    model = build_model(cfg)
    algo = ALGO_REGISTRY['OmniQuant'](model, cfg['quant'],
                                      {'data': [], 'kwargs': []}, None,
                                      cfg)
    blk = model.blocks[0]
    from llmc_tpu.models.base import get_path as _gp
    rng = np.random.RandomState(0)
    feats = {}
    for ss in algo.layout.subsets:
        width = _gp(blk, ss.layers[0])['w'].shape[1]
        feats[ss.input_key] = [jnp.asarray(
            rng.randn(1, 3, width).astype(np.float32))]
    x = np.asarray(feats['qkv_in'][0][0])
    theta = algo._init_theta(0, blk, feats)
    assert 'qkt' in theta['let']
    s = jnp.asarray(1.0 + np.random.RandomState(1).rand(
        theta['let']['qkt']['scale'].shape[0]).astype(np.float32))
    theta['let']['qkt']['scale'] = s
    theta['let'] = {'qkt': theta['let']['qkt']}  # isolate qkt
    theta['lwc'] = {}
    newblk = algo._apply_theta(blk, theta, truncate=False)
    from llmc_tpu.models.base import get_path
    q0, k0 = (get_path(blk, 'self_attn.q_proj'),
              get_path(blk, 'self_attn.k_proj'))
    q1, k1 = (get_path(newblk, 'self_attn.q_proj'),
              get_path(newblk, 'self_attn.k_proj'))
    qk0 = (x @ np.asarray(q0['w']).T) @ (x @ np.asarray(k0['w']).T).T
    qk1 = (x @ np.asarray(q1['w']).T) @ (x @ np.asarray(k1['w']).T).T
    np.testing.assert_allclose(qk1, qk0, rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(q1['w']), np.asarray(q0['w']))


def test_spqr_exact_loo_scorer():
    """simplified_outliers=False runs the exact leave-one-out pre-pass
    (spqr.py:185-201); dropping a genuinely wild column must score far
    above the rest, and the full layer path must stay finite with a
    nonempty mask."""
    import jax.numpy as jnp
    from llmc_tpu.utils import ALGO_REGISTRY, Cfg
    import llmc_tpu.compression  # noqa: F401
    from llmc_tpu.models import build_model
    cfg = tiny_config('SpQR', wbit=3,
                      special={'relative_threshold': 0.2,
                               'simplified_outliers': False,
                               'percdamp': 0.01, 'blocksize': 16})
    cfg['quant']['weight']['granularity'] = 'per_group'
    cfg['quant']['weight']['group_size'] = 16
    c = Cfg(cfg)
    model = build_model(c)
    algo = ALGO_REGISTRY['SpQR'](model, c['quant'],
                                 {'data': [], 'kwargs': []}, None, c)
    rng = np.random.RandomState(0)
    G = rng.randn(8, 16).astype(np.float32)
    G[:, 5] *= 40.0  # a wild column inflates everyone's range
    hd = np.ones(16, np.float32)
    E = np.asarray(algo._loo_scores(jnp.asarray(G), jnp.asarray(hd)))
    assert E.shape == (8, 16)
    assert (np.argmax(E, axis=1) == 5).mean() > 0.9
    # full layer run
    W = rng.randn(16, 64).astype(np.float32)
    W[3, 7] *= 50.0
    X = rng.randn(128, 64).astype(np.float32)
    H = algo._hessian([jnp.asarray(X)])
    new = algo.layer_transform({'w': jnp.asarray(W), 'b': None}, H)
    assert np.isfinite(np.asarray(new['w'])).all()
    assert np.asarray(new['spqr_mask']).sum() >= 1
