"""RTN (round-to-nearest): no transform, just fake/real quant at deploy.

Reference: /root/reference/llmc/compression/quantization/rtn.py (28 LoC —
relies entirely on the base class).
"""

from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization


@ALGO_REGISTRY.register(name='RTN')
class RTN(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)

    def subset_transform(self, idx, block, subset, feats):
        return block
