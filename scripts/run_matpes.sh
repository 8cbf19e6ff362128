#!/usr/bin/env bash
# MatPES GATA training launcher with automatic resume chaining.
#
# TPU-era counterpart of the reference LSF job scripts
# (reference models/Run_model_MatPESnota100_continue.sh:1-76: bsub GPU queue,
# walltime, sequential resume chain).  On a TPU VM there is no scheduler
# queue; preemption-safety comes from the SIGTERM emergency checkpoint
# (train/checkpoint.py) and this loop resumes from the latest checkpoint
# until the epoch budget is exhausted.
set -euo pipefail

CONFIG="${1:-default}"
EPOCHS="${2:-100}"
RUN_DIR="runs/matpes_gata"

cd "$(dirname "$0")/.."

for attempt in $(seq 1 50); do
    LATEST=""
    if [ -d "$RUN_DIR" ]; then
        LATEST=$(ls -d "$RUN_DIR"/ckpt_emergency "$RUN_DIR"/ckpt_epoch_* 2>/dev/null | sort | tail -1 || true)
    fi
    if [ -n "$LATEST" ]; then
        echo "[run_matpes] attempt $attempt: resuming from $LATEST"
        python -m equivarianttransformermpnn4quantumcomputations_tpu.train.train_matpes \
            --config "$CONFIG" --epochs "$EPOCHS" --checkpoint "$(basename "$LATEST")" \
            && break
    else
        echo "[run_matpes] attempt $attempt: fresh start"
        python -m equivarianttransformermpnn4quantumcomputations_tpu.train.train_matpes \
            --config "$CONFIG" --epochs "$EPOCHS" \
            && break
    fi
    echo "[run_matpes] training exited nonzero; resuming in 10s"
    sleep 10
done
