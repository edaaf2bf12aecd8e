from . import awq, rtn, smoothquant  # noqa: F401  (ALGO_REGISTRY entries)
from .auto_clip import AutoClipper

__all__ = ['AutoClipper']
