#!/bin/bash
# Canonical zoo sweep, one process per model: a relay/compile crash on one
# model cannot poison the others' backend state. Small models first; the
# giant per-stage transformer nets (SwT2Net 180M, UNETR2Net 136M) last.
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/zoo_sweep_r3.log}
for name in \
    nnUNetTrainerLM2NetP \
    nnUNetTrainerLightMamba2NetP \
    nnUNetTrainerSSND2NetP \
    nnUNetTrainerLM2Net \
    nnUNetTrainerLightMamba2Net \
    nnUNetTrainerSSND2Net \
    nnUNetTrainerMambaND2Net \
    nnUNetTrainerU2NetMulti \
    nnUNetTrainerLightSS2DMambaUNet \
    nnUNetTrainerUNETR \
    nnUNetTrainerSwinUMamba \
    nnUNetTrainerSwinUMambaD \
    nnUNetTrainerUNETR2Net \
    nnUNetTrainerSwT2Net \
    ; do
  echo "=== $name $(date +%H:%M:%S)" >> "$LOG"
  timeout 3600 python benchmarks/zoo_sweep.py "$name" >> "$LOG" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$LOG"
done
echo "SWEEP DONE" >> "$LOG"
