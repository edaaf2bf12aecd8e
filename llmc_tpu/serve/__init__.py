from .decode import decode_nll, forward_cached, greedy_generate, init_cache
from .mla_decode import (init_mla_cache, mla_forward_cached,
                         mla_greedy_generate)
from .kvcache import KVCachePolicy

__all__ = ['decode_nll', 'forward_cached', 'greedy_generate', 'init_cache',
           'init_mla_cache', 'mla_forward_cached', 'mla_greedy_generate',
           'KVCachePolicy']
