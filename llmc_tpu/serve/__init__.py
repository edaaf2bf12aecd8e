from .decode import decode_nll, forward_cached, greedy_generate, init_cache
from .kvcache import KVCachePolicy

__all__ = ['decode_nll', 'forward_cached', 'greedy_generate', 'init_cache',
           'KVCachePolicy']
