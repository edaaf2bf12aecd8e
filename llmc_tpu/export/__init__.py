from .exporter import export_real_quant
from .formats import (awq_quant_config, export_awq_gemm_linear,
                      export_vllm_linear, pack_int32_rows, stamp_config,
                      vllm_quant_config)

__all__ = ['export_real_quant', 'awq_quant_config',
           'export_awq_gemm_linear', 'export_vllm_linear',
           'pack_int32_rows', 'stamp_config', 'vllm_quant_config']
