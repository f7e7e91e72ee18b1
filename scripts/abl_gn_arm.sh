#!/bin/bash
# Round-3 backbone-recipe ablation, arm (b): GroupNorm + full backbone
# lr, from scratch (VERDICT r2 next-round item 1).
#
# Geometry/data/seed identical to the round-2 bigrun (scripts/
# bigrun_pretrain.sh) except:
#   batch_norm_type=group  lr_backbone=1e-4   <- the from-scratch recipe
# plus this round's transport changes (uint8 transfer, sample reuse),
# so the arm doubles as the it/s measurement for the new pipeline.
# Arm (a) = outputs/bigrun history (FrozenBN-identity @ lr_backbone
# 1e-5, epochs 0-16 with per-epoch CER in log.txt).
set -u
SNAP=/tmp/abl_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
EPOCHS=${ABL_EPOCHS:-4}
OUT=${ABL_OUT:-/root/repo/outputs/abl_gn}
EXTRA=${ABL_EXTRA:-}

while :; do
  python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir "$OUT" \
    --steps_per_epoch 1000 --eval_every 1 --seed 0 \
    --epochs "$EPOCHS" \
    --options batch_size=8 use_ema=True warmup_steps=1000 \
      max_targets=64 'data_aug_scales=[128]' data_aug_max_size=1024 \
      image_w_max=1024 image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
      save_checkpoint_interval=5 lr_drop=40 rss_restart_gb=60 \
      batch_norm_type=group lr_backbone=1e-4 $EXTRA
  code=$?
  [ "$code" -eq 0 ] && break
  [ "$code" -eq 3 ] || sleep 10
  echo "[abl loop] restarting after exit $code"
done
echo "[abl] done, exit $code"
