from .config import (Cfg, check_config, get_modality, iter_compress_sections,
                     load_config, seed_all)
from .offload import (offload_model_blocks, streaming_ppl, tree_to_device,
                      tree_to_host)
from .registry import (ALGO_REGISTRY, EVAL_REGISTRY, KV_REGISTRY,
                       MODEL_REGISTRY, PREPROC_REGISTRY,
                       TOKEN_REDUCTION_REGISTRY, Registry)

__all__ = [
    'offload_model_blocks', 'streaming_ppl', 'tree_to_device',
    'tree_to_host',
    'Cfg', 'check_config', 'get_modality', 'iter_compress_sections',
    'load_config', 'seed_all', 'ALGO_REGISTRY', 'EVAL_REGISTRY',
    'KV_REGISTRY', 'MODEL_REGISTRY', 'PREPROC_REGISTRY',
    'TOKEN_REDUCTION_REGISTRY', 'Registry',
]
