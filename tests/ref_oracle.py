"""Load the read-only reference implementation (/root/reference) as a
numerical oracle for parity tests.

The reference is pure PyTorch; we import its modules in-process (with
stubs for unavailable optional deps) and compare golden values against our
JAX implementation.  Nothing from the reference is copied into the repo —
it is used strictly as a test-time ground truth.
"""

import importlib
import logging
import os
import sys
import types

REF_ROOT = '/root/reference'


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, 'llmc'))


_loaded = {}


def load_ref_module(dotted: str):
    """Import e.g. 'llmc.compression.quantization.quant' from the reference
    tree with optional-deps stubbed out."""
    if dotted in _loaded:
        return _loaded[dotted]
    loguru = _stub('loguru')
    if not hasattr(loguru, 'logger'):
        loguru.logger = logging.getLogger('ref')
    qtq = _stub('qtorch.quant')
    if not hasattr(qtq, 'float_quantize'):
        qtq.float_quantize = None
    _stub('qtorch').quant = qtq
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    mod = importlib.import_module(dotted)
    _loaded[dotted] = mod
    return mod
