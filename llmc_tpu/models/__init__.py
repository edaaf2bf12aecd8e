from .adapter import BaseAdapter, LlamaAdapter, QMap, build_model
from .base import (BlockLayout, LinearQcfg, SubsetSpec, get_path, layer_norm,
                   linear_apply, rms_norm, set_path, update_path)
from .llama import LlamaConfig

__all__ = [
    'BaseAdapter', 'LlamaAdapter', 'QMap', 'build_model', 'BlockLayout',
    'LinearQcfg', 'SubsetSpec', 'get_path', 'layer_norm', 'linear_apply',
    'rms_norm', 'set_path', 'update_path', 'LlamaConfig',
]
