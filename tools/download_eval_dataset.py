"""Download eval datasets (wikitext2/c4/ptb test splits) to disk.

Thin entry over download_calib_dataset.run('eval') — one shared
implementation, two reference-named entry points."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from download_calib_dataset import run  # noqa: E402

if __name__ == '__main__':
    run('eval')
