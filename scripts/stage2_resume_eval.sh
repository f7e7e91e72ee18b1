#!/bin/bash
# Stage-2-only rerun: resume the full-model CTC finetune from the
# stage-1 checkpoint already in <out> (after the stage-switch resume
# fix), then the standalone evaluator sweep. Used when stage 1 of
# scripts/stage2_finetune.sh completed but stage 2 aborted.
set -e
OUT=${1:-/root/repo/outputs/finetune_noaccent}
S2=${2:-4000}
SNAP=/tmp/stage2b_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent eval_epoch=1"

eval python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$OUT" \
  --resume_finetuning --epochs 2 --seed 4 \
  --options max_iterations=$S2 $COMMON_OPTS

eval python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" --sweep --max_images 200 --batch_size 8 \
  --options $COMMON_OPTS
