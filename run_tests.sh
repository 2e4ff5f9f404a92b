#!/bin/bash
# Test suite in process batches: a single pytest process accumulates XLA CPU
# compiler state across ~150 jitted programs and can segfault in
# backend_compile_and_load; separate processes per batch avoid it.
#
# Default = FAST tier (~5-6 min on the 1-core rig): foundations, imageio,
# preprocessing, planning, conversion, postprocessing, losses, scan kernels,
# data pipeline. Full-model trace batches (zoo / x2net / m2net / torch parity /
# trainer loops / integration: 1h+ of CPU tracing) run with --slow.
set -e
cd "$(dirname "$0")"
PYTEST="python -m pytest -q"

RUN_SLOW=0
ARGS=()
for a in "$@"; do
  case "$a" in
    --slow) RUN_SLOW=1 ;;
    *) ARGS+=("$a") ;;
  esac
done

# ---------------- fast tier (measured ~85s + ~220s) ----------------
$PYTEST tests/test_foundations.py tests/test_imageio.py tests/test_preprocessing.py \
        tests/test_planning.py tests/test_dataset_conversion.py \
        tests/test_postprocessing_ensembling.py "${ARGS[@]}"
$PYTEST tests/test_losses.py tests/test_selective_scan.py tests/test_data_pipeline.py \
        "${ARGS[@]}"

if [ "$RUN_SLOW" != "1" ]; then
  echo "FAST TEST TIER PASSED (add --slow for the full-model trace batches)"
  exit 0
fi

# ---------------- slow tier: full-model traces + end-to-end ----------------
$PYTEST tests/test_models_basic.py tests/test_zoo_models.py "${ARGS[@]}"
$PYTEST tests/test_m2net.py "${ARGS[@]}"
$PYTEST tests/test_x2net.py tests/test_cross_scan.py "${ARGS[@]}"
$PYTEST tests/test_unetr2net.py tests/test_mamba_nd2net.py "${ARGS[@]}"
$PYTEST tests/test_torch_parity.py tests/test_param_fidelity.py "${ARGS[@]}"
$PYTEST tests/test_finetune_warmup.py "${ARGS[@]}"
$PYTEST tests/test_trainer.py tests/test_translation_target.py tests/test_cascade.py "${ARGS[@]}"
$PYTEST tests/test_ssl_target.py tests/test_blosc2_backend.py "${ARGS[@]}"
$PYTEST tests/test_multihost.py "${ARGS[@]}"
$PYTEST tests/test_inference.py "${ARGS[@]}"
$PYTEST tests/test_trainer_m2net.py "${ARGS[@]}"
$PYTEST tests/test_integration.py "${ARGS[@]}"
echo "ALL TEST BATCHES PASSED"
