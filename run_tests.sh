#!/bin/bash
# Full test suite in process batches: a single pytest process accumulates XLA CPU
# compiler state across ~150 jitted programs and can segfault in
# backend_compile_and_load; separate processes per batch avoid it.
set -e
cd "$(dirname "$0")"
PYTEST="python -m pytest -q"
$PYTEST tests/test_foundations.py tests/test_imageio.py tests/test_preprocessing.py \
        tests/test_planning.py tests/test_dataset_conversion.py \
        tests/test_postprocessing_ensembling.py "$@"
$PYTEST tests/test_losses.py tests/test_selective_scan.py tests/test_data_pipeline.py "$@"
$PYTEST tests/test_models_basic.py tests/test_zoo_models.py "$@"
$PYTEST tests/test_m2net.py "$@"
$PYTEST tests/test_x2net.py tests/test_cross_scan.py "$@"
$PYTEST tests/test_unetr2net.py tests/test_mamba_nd2net.py "$@"
$PYTEST tests/test_torch_parity.py tests/test_param_fidelity.py "$@"
$PYTEST tests/test_finetune_warmup.py "$@"
$PYTEST tests/test_trainer.py tests/test_translation_target.py tests/test_cascade.py "$@"
$PYTEST tests/test_ssl_target.py tests/test_blosc2_backend.py "$@"
$PYTEST tests/test_multihost.py "$@"
$PYTEST tests/test_inference.py "$@"
$PYTEST tests/test_trainer_m2net.py "$@"
$PYTEST tests/test_integration.py "$@"
echo "ALL TEST BATCHES PASSED"
