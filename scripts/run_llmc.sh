#!/bin/bash
# TPU launcher for llmc_tpu (the analog of the reference's
# scripts/run_llmc.sh torchrun launcher).  Single-host by default; for a
# multi-host TPU slice set the jax.distributed variables below on every
# host (llmc_tpu/parallel/multihost.py reads them).
set -euo pipefail

llmc_tpu=${LLMC_TPU_ROOT:-$(cd "$(dirname "$0")/.." && pwd)}
task_name=${1:-rtn_w4}
config=${2:-${llmc_tpu}/configs/ci/${task_name}.yml}

# multi-host (uncomment + fill in for a v5e pod slice); these are the
# variables llmc_tpu/parallel/multihost.py:init_distributed reads, and
# run_pipeline calls it at entry on every host:
# export JAX_COORDINATOR_ADDRESS=10.0.0.2:8476   # host 0 address
# export JAX_NUM_PROCESSES=4
# export JAX_PROCESS_ID=${TPU_WORKER_ID}

mkdir -p "${llmc_tpu}/save/${task_name}"
cd "${llmc_tpu}"
nohup python -m llmc_tpu --config "${config}" --task_id "${task_name}" \
    > "${llmc_tpu}/save/${task_name}/${task_name}.log" 2>&1 &
echo $! > "${llmc_tpu}/save/${task_name}/${task_name}.pid"
echo "launched ${task_name} (pid $(cat "${llmc_tpu}/save/${task_name}/${task_name}.pid")); log: save/${task_name}/${task_name}.log"
