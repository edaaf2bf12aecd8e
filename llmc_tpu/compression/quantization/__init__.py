from . import (adadim, awq, dgq, gptq, hqq, llmint8, ntweak, omniq,  # noqa
               osplus, quarot, quik, rtn, smoothquant, spqr, tesseraq)
from .auto_clip import AutoClipper

__all__ = ['AutoClipper']
