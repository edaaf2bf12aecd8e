from .code import HumanEval
from .latency import LatencyEval
from .harness import CustomGenerate, LMEvalAdapter, run_lm_eval
from .ppl import DecodePerplexityEval, PerplexityEval, TokenConsistencyEval

__all__ = ['HumanEval', 'LatencyEval','CustomGenerate', 'LMEvalAdapter', 'run_lm_eval',
           'DecodePerplexityEval', 'PerplexityEval',
           'TokenConsistencyEval']
from .vqa import LmmsEvalAdapter, VQAEval
