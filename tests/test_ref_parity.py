"""End-to-end PPL parity vs the reference pipeline (tools/parity.py).

Runs the REFERENCE llmc main() (torch CPU, /root/reference) and our
pipeline on the same tiny OPT checkpoint + tokenizer + datasets and
asserts the BASELINE.md acceptance gate |dPPL| <= 0.1 at every eval
position.  RTN only here (fast); AWQ/GPTQ are covered by the committed
PARITY.md run (`python tools/parity.py`).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tools import parity  # noqa: E402


@pytest.mark.skipif(not os.path.isdir('/root/reference/llmc'),
                    reason='reference tree not available')
def test_rtn_ppl_matches_reference(tmp_path):
    rows = parity.run_parity(str(tmp_path), methods=['RTN-W4A16'])
    assert rows, 'no parity rows produced'
    for name, pos, ref, ours, delta in rows:
        assert delta <= 0.1, (name, pos, ref, ours, delta)
    # pretrain must match to float noise: same model, same eval
    pre = [r for r in rows if r[1] == 'pretrain']
    assert pre and pre[0][4] < 1e-3
