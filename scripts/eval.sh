#!/usr/bin/env bash
# Batch evaluation across checkpoints and model types
# (reference scripts/eval.sh:1-41 equivalent).
set -euo pipefail

BASE_PATH="${BASE_PATH:-$HOME/Datasets/Depth_Dataset_Bengaluru}"
DATASET="${DATASET:-bdd}"
VERSION="${VERSION:-3}"
MODELS=("${MODELS[@]:-dpt_swin2_tiny_256}")
CKPT_GLOB="${CKPT_GLOB:-checkpoints/*/*/checkpoint_epoch_*}"

for model in "${MODELS[@]}"; do
  echo "=== baseline comparison: $model"
  python -m soccdpt_tpu.cli.eval_others -m "$model" -dt "$DATASET" -b "$BASE_PATH"
  for ckpt in $CKPT_GLOB; do
    [ -e "$ckpt" ] || continue
    echo "=== eval $model @ $ckpt"
    python -m soccdpt_tpu.cli.eval -v "$VERSION" -dt "$DATASET" \
      -t "$model" -b "$BASE_PATH" -l "$ckpt" --skip_fps
  done
  echo "=== timing: $model"
  python -m soccdpt_tpu.cli.eval_timing -t "$model" --json
done
