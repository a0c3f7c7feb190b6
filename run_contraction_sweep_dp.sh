#!/usr/bin/env bash
# Multi-device contraction-coefficient sweep — mirror of the reference's
# run_ContractionCoefficientsChanges_2gpus.sh:5-18 (nested dataset x
# coefficient x batch-size loops under DataParallel, tee'd logs), run
# data-parallel over a TPU mesh (--gpus N -> N mesh devices; on a CPU
# host export XLA_FLAGS=--xla_force_host_platform_device_count=8 and
# JAX_PLATFORMS=cpu for a virtual mesh).
set -euo pipefail
DEVICES="${DEVICES:-8}"
EPOCHS="${EPOCHS:-20}"
mkdir -p Logs
for dataset in ENZYMES MUTAG; do
  for coeff in 0.4 0.6 0.8; do
    for bs in 32 64; do
      log="Logs/${dataset}-TopK-dp${DEVICES}-C${coeff}-B${bs}.log"
      python -m pytorch_geometric_tpu.research.driver \
        --dataset "${dataset}" --modelName TopK \
        --ConCoeff "${coeff}" --Batch_size "${bs}" \
        --epochs "${EPOCHS}" --fine_tune_epochs "${EPOCHS}" \
        --gpus "${DEVICES}" --MonteSize 1 \
        2>&1 | tee "${log}"
    done
  done
done
