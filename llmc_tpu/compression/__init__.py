from .blockwise import BaseBlockwiseQuantization, BlockwiseOpt
from . import transforms
from . import sparsification  # noqa: F401  (ALGO_REGISTRY entries)
from . import token_reduction  # noqa: F401  (TOKEN_REDUCTION_REGISTRY)
from .quantization import *  # noqa: F401,F403  (registers algorithms)

__all__ = ['BaseBlockwiseQuantization', 'BlockwiseOpt', 'transforms']
