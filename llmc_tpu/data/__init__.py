from .dataset import CalibDataset
from . import preproc  # noqa: F401  (registers PREPROC_REGISTRY entries)

__all__ = ['CalibDataset']
