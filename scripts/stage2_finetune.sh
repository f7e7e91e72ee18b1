#!/bin/bash
# Round-2 flagship pipeline, stage 2+3: two-stage CTC finetune onto the
# 64-char no-accent synthetic target (exercises the 166->64 class-head
# surgery + smart mapping, reference finetuning.py:422-539), then the
# standalone evaluator with a TH x NMS sweep producing stats.json
# (reference evaluation.py:460-582).
#
# Usage: bash scripts/stage2_finetune.sh <pretrain_dir> [steps1] [steps2]
set -e
PRE=${1:-/root/repo/outputs/bigrun}
S1=${2:-1500}
S2=${3:-4000}
SNAP=/tmp/stage2_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

OUT=/root/repo/outputs/finetune_noaccent
COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent eval_epoch=1"

# stage 1: fresh class heads + smart mapping, heads-only optimizer
eval python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --pretrain_dir "$PRE" \
  --output_dir "$OUT" --new_class_embedding --smart_mapping \
  --epochs 1 --seed 3 \
  --options max_iterations=$S1 $COMMON_OPTS

# stage 2: resume, full model
eval python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$OUT" \
  --resume_finetuning --epochs 2 --seed 4 \
  --options max_iterations=$S2 $COMMON_OPTS

# evaluate: greedy + NMS sweep -> stats.json
eval python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" --sweep --max_images 200 --batch_size 8 \
  --options $COMMON_OPTS
