from .qspec import FLOAT_FORMATS, QuantSpec, spec_from_config
from .fp_formats import float_cast, float_cast_format
from .fp8_block import (act_quant_per_group, fp8_block_matmul,
                        weight_cast_to_bf16, weight_cast_to_fp8)
from .quantizer import (QParams, dequant, fake_quant_act,
                        fake_quant_act_static, fake_quant_weight,
                        fake_quant_weight_static, fake_quant_weight_w48,
                        hqq_qparams, learnable_range, minmax_range, mse_range,
                        pack_int4, qparams_from_range, quant, quant_dequant,
                        real_quant_weight, reshape_tensor, restore_tensor,
                        ste_round, tensor_qparams, unpack_int4)

__all__ = [
    'act_quant_per_group', 'fp8_block_matmul', 'weight_cast_to_bf16',
    'weight_cast_to_fp8',
    'FLOAT_FORMATS', 'QuantSpec', 'spec_from_config', 'float_cast',
    'float_cast_format', 'QParams', 'dequant', 'fake_quant_act',
    'fake_quant_act_static', 'fake_quant_weight', 'fake_quant_weight_static',
    'fake_quant_weight_w48', 'hqq_qparams', 'learnable_range', 'minmax_range',
    'mse_range', 'pack_int4', 'qparams_from_range', 'quant', 'quant_dequant',
    'real_quant_weight', 'reshape_tensor', 'restore_tensor', 'ste_round',
    'tensor_qparams', 'unpack_int4',
]
