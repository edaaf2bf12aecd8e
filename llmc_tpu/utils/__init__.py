from .config import (Cfg, check_config, get_modality, iter_compress_sections,
                     load_config, seed_all)
from .registry import (ALGO_REGISTRY, EVAL_REGISTRY, KV_REGISTRY,
                       MODEL_REGISTRY, PREPROC_REGISTRY,
                       TOKEN_REDUCTION_REGISTRY, Registry)

__all__ = [
    'Cfg', 'check_config', 'get_modality', 'iter_compress_sections',
    'load_config', 'seed_all', 'ALGO_REGISTRY', 'EVAL_REGISTRY',
    'KV_REGISTRY', 'MODEL_REGISTRY', 'PREPROC_REGISTRY',
    'TOKEN_REDUCTION_REGISTRY', 'Registry',
]
