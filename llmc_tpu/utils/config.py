"""YAML config loading and validation.

Reference semantics: /root/reference/llmc/__main__.py:188-190 (yaml →
EasyDict) and /root/reference/llmc/utils/utils.py:21-52 (check_config),
:80-97 (modality dispatch).  Independent implementation: a small immutable
attribute-dict plus explicit validation.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Tuple

import numpy as np


class Cfg(dict):
    """Attribute-accessible nested dict (EasyDict equivalent)."""

    def __init__(self, d: Dict = None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)

    def get_nested(self, path: str, default=None):
        cur = self
        for part in path.split('.'):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def load_config(path: str) -> Cfg:
    import yaml
    with open(path) as f:
        return Cfg(yaml.safe_load(f))


def check_config(config: Cfg) -> None:
    """Validate a config the way the reference's check_config does
    (utils/utils.py:21-52): weight granularity constraints, calib/eval
    consistency, save-flag sanity."""
    if 'model' not in config:
        raise ValueError('config must have a model section')
    for modality_cfg in iter_compress_sections(config):
        w = modality_cfg.get('weight')
        if w:
            gran = w.get('granularity', 'per_channel')
            if gran == 'per_group' and int(w.get('group_size', 128)) <= 0:
                raise ValueError('per_group requires positive group_size')
            if gran == 'per_head' and int(w.get('head_num', 0)) <= 0:
                raise ValueError('per_head requires head_num')
    if 'eval' in config and config.eval:
        ev = config.eval
        evs = ev if isinstance(ev, list) else [ev]
        for e in evs:
            for pos in e.get('eval_pos', []):
                if pos not in ('pretrain', 'transformed', 'fake_quant',
                               'fake_quant_wo_kv'):
                    raise ValueError(f'unknown eval_pos {pos!r}')
    save = config.get('save', {})
    real_flags = [k for k in save if k.startswith('save_') and save[k]]
    if save.get('save_fake') and save.get('save_trans'):
        pass  # both allowed, like the reference
    del real_flags


def iter_compress_sections(config: Cfg) -> List[Cfg]:
    """All quant/sparse sections, flattening per-modality nesting
    (utils/utils.py:80-92)."""
    out = []
    for key in ('quant', 'sparse'):
        if key not in config:
            continue
        sec = config[key]
        sub = [m for m in ('language', 'vision', 'video_gen') if m in sec]
        if sub:
            out.extend(sec[m] for m in sub)
        else:
            out.append(sec)
    return out


def get_modality(config: Cfg) -> List[Tuple[str, Cfg]]:
    """(modality, sub-config) pairs run sequentially, default ('language',
    config.quant) (utils/utils.py:80-97)."""
    for key in ('quant', 'sparse'):
        if key not in config:
            continue
        sec = config[key]
        sub = [m for m in ('vision', 'language', 'video_gen') if m in sec]
        if sub:
            return [(m, sec[m]) for m in sub]
        return [('language', sec)]
    return []


def seed_all(seed: int) -> None:
    """Deterministic seeding (utils/utils.py:10-18).  JAX randomness is
    explicit-key so only python/numpy need global seeds; jax keys are
    derived from the seed at call sites."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
