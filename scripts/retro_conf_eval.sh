#!/bin/bash
# Retro-evaluate round-2 frozen-BN bigrun checkpoints with the round-3
# observability (max sigmoid confidence, queries-above-TH): arm (a) of
# the backbone-recipe ablation. Uses the exact dumped bigrun config
# (FrozenBatchNorm identity stats, f32 transfers) so the restored
# structure matches. Run ONLY when nothing else is on the TPU.
set -u
cd /root/repo
for SRC in checkpoint0004 checkpoint; do
  TMP=/tmp/retro_$SRC
  rm -rf "$TMP" && mkdir -p "$TMP"
  cp -r "outputs/bigrun/$SRC" "$TMP/checkpoint"
  echo "=== retro-eval $SRC ==="
  python -m dtlr_tpu.train.pretrain \
    -c outputs/bigrun/config_cfg.py \
    --dataset_file synthetic_line_OCR_general \
    --output_dir "$TMP" --eval --seed 0 --steps_per_epoch 1000 \
    --options compilation_cache_dir=/root/repo/outputs/xla_cache \
    2>&1 | grep -E "eval:|resumed|error" | tail -5
done
