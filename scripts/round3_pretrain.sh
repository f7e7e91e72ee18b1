#!/bin/bash
# Round-3 flagship pretrain: GroupNorm from-scratch recipe (ablation
# winner, see ROUND3_NOTES.md), full Latin flagship geometry, as many
# steps as the wall-clock budget allows (R3_DEADLINE, epoch seconds).
#
# Continues outputs/abl_gn if present (the ablation arm IS the first
# epochs of this run: same config, data stream, and seed).
set -u
SNAP=/tmp/r3run_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
EPOCHS=${R3_EPOCHS:-100}
DEADLINE=${R3_DEADLINE:-0}
OUT=${R3_OUT:-/root/repo/outputs/r3run}
EXTRA=${R3_EXTRA:-}

while :; do
  python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir "$OUT" \
    --steps_per_epoch 1000 --eval_every 1 --seed 0 \
    --epochs "$EPOCHS" --deadline "$DEADLINE" \
    --options batch_size=8 use_ema=True warmup_steps=1000 \
      max_targets=64 'data_aug_scales=[128]' data_aug_max_size=1024 \
      image_w_max=1024 image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
      save_checkpoint_interval=10 lr_drop=44 rss_restart_gb=80 \
      batch_norm_type=group lr_backbone=1e-4 $EXTRA
  code=$?
  [ "$code" -eq 0 ] && break
  [ "$code" -eq 3 ] || sleep 10
  echo "[r3run loop] restarting after exit $code"
done
echo "[r3run] pretrain finished, exit $code"
