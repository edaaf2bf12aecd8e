from .blockwise import BaseBlockwiseQuantization, BlockwiseOpt
from . import transforms
from .quantization import *  # noqa: F401,F403  (registers algorithms)

__all__ = ['BaseBlockwiseQuantization', 'BlockwiseOpt', 'transforms']
