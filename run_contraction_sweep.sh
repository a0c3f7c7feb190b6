#!/usr/bin/env bash
# Hyperparameter sweep driver — mirror of the reference's nested-loop
# bash sweeps (run_ContractionCoefficientsChanges_{1,2}gpus.sh:5-21):
# grid over dataset x model x contraction coefficient, logging via tee.
set -u
mkdir -p Logs

DATASETS=${DATASETS:-"Cora"}
MODELS=${MODELS:-"GCN"}
CONCOEFFS=${CONCOEFFS:-"0.4 0.6 0.8"}
EPOCHS=${EPOCHS:-100}
FINE=${FINE:-100}
MONTE=${MONTE:-3}

for dataset in $DATASETS; do
  for model in $MODELS; do
    for coeff in $CONCOEFFS; do
      echo "=== $dataset $model ConCoeff=$coeff ==="
      python -m pytorch_geometric_tpu.research.driver \
        --dataset "$dataset" --modelName "$model" \
        --ConCoeff "$coeff" --epochs "$EPOCHS" \
        --fine_tune_epochs "$FINE" --MonteSize "$MONTE" \
        2>&1 | tee "Logs/${dataset}-${model}-${coeff}.log"
    done
  done
done
