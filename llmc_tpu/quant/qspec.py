"""Quantization specification.

A ``QuantSpec`` is a frozen, hashable description of *how* to quantize a
tensor: bit-width (integer or float format), symmetry, granularity and the
calibration algorithm.  It is deliberately a static dataclass so it can be
closed over by ``jax.jit``-ed programs without retracing hazards.

Reference semantics: /root/reference/llmc/compression/quantization/quant.py
(BaseQuantizer.__init__ :46-105, IntegerQuantizer :661-720,
FloatQuantizer :963-1040).  This is a re-design, not a port: quantizers here
are *pure functions* over (spec, tensor) instead of stateful objects.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Supported float formats: name -> (exponent bits, mantissa bits, max finite)
# e4m3 follows the "fn" (finite-only) convention used by torch.float8_e4m3fn.
FLOAT_FORMATS = {
    'e4m3': (4, 3, 448.0),
    'e5m2': (5, 2, 57344.0),
    'e3m2': (3, 2, 28.0),
    'e4m7': (4, 7, 510.0),
    'e2m1': (2, 1, 6.0),
}

# per_token (activations) and per_channel (weights) both reduce over the
# last axis; they are distinct names to mirror reference configs.
GRANULARITIES = ('per_tensor', 'per_channel', 'per_token', 'per_group',
                 'per_head', 'per_block')


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a quantization scheme."""

    bit: object = 8                 # int bits, or a float-format str ('e4m3')
    symmetric: bool = True
    granularity: str = 'per_channel'
    group_size: int = 128           # for per_group
    head_num: int = 0               # for per_head
    block_size: int = 128           # for per_block
    calib_algo: str = 'minmax'      # minmax | mse | hqq | learnable
    round_zp: bool = True
    # mse calibration (quant.py:146-204)
    mse_b_num: int = 1
    maxshrink: float = 0.8
    mse_grid: int = 100
    mse_norm: float = 2.4
    # hqq proximal solver (quant.py:588-610)
    hqq_lp_norm: float = 0.7
    hqq_beta: float = 10.0
    hqq_kappa: float = 1.01
    hqq_iters: int = 20
    # explicit integer range override (quant.py:664-667)
    int_range: Optional[Tuple[int, int]] = None
    # float-format behaviour: scaled cast (qtorch-equivalent) vs per-element
    # exponent scales (quant.py get_float_qparams :1005-1027)
    use_fp_scaled_cast: bool = True
    # Weight48 double quantization is expressed as a pair of specs elsewhere.

    def __post_init__(self):
        if self.granularity not in GRANULARITIES:
            raise ValueError(f'unknown granularity {self.granularity!r}')
        if self.is_float and self.bit not in FLOAT_FORMATS:
            raise ValueError(f'unknown float format {self.bit!r}')
        if self.granularity == 'per_block':
            if not (self.symmetric and self.calib_algo in ('minmax',)):
                raise ValueError('per_block requires symmetric minmax')

    # ---- derived properties -------------------------------------------------

    @property
    def is_float(self) -> bool:
        return isinstance(self.bit, str)

    @property
    def e_bits(self) -> int:
        return FLOAT_FORMATS[self.bit][0]

    @property
    def m_bits(self) -> int:
        return FLOAT_FORMATS[self.bit][1]

    @property
    def fp_max(self) -> float:
        return FLOAT_FORMATS[self.bit][2]

    @property
    def qmin(self) -> float:
        if self.is_float:
            return -self.fp_max
        if self.int_range is not None:
            return float(self.int_range[0])
        if self.symmetric:
            return float(-(2 ** (self.bit - 1)))
        return 0.0

    @property
    def qmax(self) -> float:
        if self.is_float:
            return self.fp_max
        if self.int_range is not None:
            return float(self.int_range[1])
        if self.symmetric:
            return float(2 ** (self.bit - 1) - 1)
        return float(2 ** self.bit - 1)

    def replace(self, **kw) -> 'QuantSpec':
        return dataclasses.replace(self, **kw)


def spec_from_config(cfg: dict) -> QuantSpec:
    """Build a QuantSpec from a reference-style YAML section.

    Mirrors the ``weight:``/``act:`` sections of the reference configs, e.g.
    ``{bit: 4, symmetric: false, granularity: per_group, group_size: 128}``.
    """
    if cfg is None:
        return None
    kw = {}
    kw['bit'] = cfg.get('bit', 8)
    kw['symmetric'] = bool(cfg.get('symmetric', True))
    kw['granularity'] = cfg.get('granularity', 'per_channel')
    for k_src, k_dst in (
        ('group_size', 'group_size'), ('head_num', 'head_num'),
        ('block_size', 'block_size'), ('calib_algo', 'calib_algo'),
        ('round_zp', 'round_zp'), ('mse_b_num', 'mse_b_num'),
        ('maxshrink', 'maxshrink'), ('mse_grid', 'mse_grid'),
        ('lp_norm', 'hqq_lp_norm'), ('beta', 'hqq_beta'),
        ('kappa', 'hqq_kappa'), ('iters', 'hqq_iters'),
    ):
        if k_src in cfg:
            kw[k_dst] = cfg[k_src]
    if 'int_range' in cfg:
        kw['int_range'] = tuple(cfg['int_range'])
    if 'use_qtorch' in cfg:
        kw['use_fp_scaled_cast'] = bool(cfg['use_qtorch'])
    if isinstance(kw['bit'], str) and kw['bit'] in FLOAT_FORMATS:
        kw['symmetric'] = True
    return QuantSpec(**kw)
