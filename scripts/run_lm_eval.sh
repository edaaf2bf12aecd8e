#!/bin/bash
# lm-evaluation-harness on a compressed model (the analog of the
# reference's scripts/run_lm_eval.sh accelerate launcher).  Uses the
# in-process LMEvalAdapter (llmc_tpu/eval/harness.py) -- no subprocess
# model server needed; requires `pip install lm_eval`.
set -euo pipefail
llmc_tpu=${LLMC_TPU_ROOT:-$(cd "$(dirname "$0")/.." && pwd)}
cd "${llmc_tpu}"
python tools/llm_eval.py \
    --config "${1:-configs/ci/rtn_w4.yml}" \
    --tasks "${2:-lambada_openai,arc_easy}" \
    --batch_size 8 \
    --output_path ./save/lm_eval
