from .decode import decode_nll, forward_cached, greedy_generate, init_cache
from .engine import Request, ServingEngine
from .kvcache import KVCachePolicy
from .mla_decode import (init_mla_cache, mla_forward_cached,
                         mla_greedy_generate)
from .packed import pack_model, random_packed_llama

__all__ = ['decode_nll', 'forward_cached', 'greedy_generate', 'init_cache',
           'init_mla_cache', 'mla_forward_cached', 'mla_greedy_generate',
           'KVCachePolicy', 'Request', 'ServingEngine', 'pack_model',
           'random_packed_llama']
