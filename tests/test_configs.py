"""Config corpus: every shipped YAML must pass fail-fast validation
(check_config + per-algorithm check_special) and every configs/ci/*.yml
must run end-to-end through the pipeline CLI path — the analog of the
reference's ci_check/ smoke suite (SURVEY.md §4)."""

import glob
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _all_configs():
    return sorted(glob.glob(os.path.join(REPO, 'configs', '**', '*.yml'),
                            recursive=True))


def _ci_configs():
    return sorted(glob.glob(os.path.join(REPO, 'configs', 'ci', '*.yml')))


def test_corpus_covers_methods_and_backends():
    names = '\n'.join(_all_configs())
    for m in ('rtn', 'awq', 'gptq', 'smoothquant', 'osplus', 'omniquant',
              'normtweaking', 'tesseraq', 'adadim', 'quik', 'spqr', 'dgq',
              'llmint8', 'hqq', 'quarot', 'w48', 'mix_precision',
              'fp_quant', 'kvquant'):
        assert m in names.lower(), f'no config for {m}'
    for b in ('vllm', 'sgl', 'lightllm', 'autoawq', 'mlcllm', 'trtllm'):
        assert b in names.lower(), f'no backend config for {b}'
    assert 'step_1_awq' in names and 'step_2_omniq' in names


@pytest.mark.parametrize('path', _all_configs(),
                         ids=[os.path.relpath(p, REPO)
                              for p in _all_configs()])
def test_config_validates(path):
    from llmc_tpu.utils import (ALGO_REGISTRY, Cfg, check_config,
                                get_modality, load_config)
    import llmc_tpu.compression  # noqa: F401
    cfg = Cfg(load_config(path))
    check_config(cfg)
    for _, mcfg in get_modality(cfg):
        cls = ALGO_REGISTRY[mcfg['method']]
        check = getattr(cls, 'check_special', None)
        if check is not None:
            check(mcfg.get('special', {}) or {})


@pytest.mark.parametrize('path', _ci_configs(),
                         ids=[os.path.basename(p) for p in _ci_configs()])
def test_ci_config_runs_end_to_end(path):
    from llmc_tpu.main import run_pipeline
    from llmc_tpu.utils import load_config
    res = run_pipeline(load_config(path))
    if 'ppl_fake_quant' in res:
        assert np.isfinite(res['ppl_fake_quant'])
    assert res['model'] is not None
