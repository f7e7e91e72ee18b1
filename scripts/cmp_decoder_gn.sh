#!/bin/bash
# Round-3 decoder-CA decision at recognition quality (r2 VERDICT item 4):
# dense vs reference-faithful deformable decoder cross-attention at
# EQUAL budget with the fixed GroupNorm backbone recipe, extended until
# the CER trajectories are meaningful (goal: CER well under the round-2
# garbage-phase 18). Same 4+4/500q geometry and seed as round-2's
# comparison; deltas: GN recipe + this round's transport (uint8, reuse).
#
# Usage: bash scripts/cmp_decoder_gn.sh [epochs]
set -u
EPOCHS=${1:-3}
SNAP=/tmp/cmpgn_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

COMMON="--dataset_file synthetic_line_OCR_general --steps_per_epoch 1000 \
  --eval_every 1 --seed 11"
OPTS="batch_size=8 use_ema=False warmup_steps=500 max_targets=64 \
  'data_aug_scales=[128]' data_aug_max_size=1024 image_w_max=1024 \
  image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
  enc_layers=4 dec_layers=4 num_queries=500 dn_number=50 lr_drop=40 \
  batch_norm_type=group lr_backbone=1e-4 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

status=0
for CA in dense deform; do
  if ! eval python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --output_dir /root/repo/outputs/cmpgn_$CA \
    --epochs $EPOCHS $COMMON \
    --options $OPTS decoder_ca=$CA; then
    echo "[cmpgn] $CA arm FAILED"; status=1
  fi
done

echo "== held-out CER trajectories (GN recipe) =="
grep -h '"eval"' /root/repo/outputs/cmpgn_dense/log.txt 2>/dev/null
grep -h '"eval"' /root/repo/outputs/cmpgn_deform/log.txt 2>/dev/null
exit $status
