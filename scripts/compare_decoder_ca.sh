#!/bin/bash
# VERDICT round-1 item 2: dense decoder cross-attention vs
# reference-faithful deformable CA at EQUAL training budget, scored by
# held-out greedy CER (not loss). Same geometry (4 enc + 4 dec, 500
# queries), same data settings and seed; the only delta is decoder_ca.
#
# Usage: bash scripts/compare_decoder_ca.sh [epochs]
set -e
EPOCHS=${1:-4}
SNAP=/tmp/cmp_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

COMMON="--dataset_file synthetic_line_OCR_general --steps_per_epoch 1000 \
  --eval_every 1 --seed 11"
OPTS="batch_size=8 use_ema=False warmup_steps=500 max_targets=64 \
  'data_aug_scales=[128]' data_aug_max_size=1024 image_w_max=1024 \
  image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
  enc_layers=4 dec_layers=4 num_queries=500 dn_number=50 lr_drop=40"

for CA in dense deform; do
  eval python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --output_dir /root/repo/outputs/cmp_$CA \
    --epochs $EPOCHS $COMMON \
    --options $OPTS decoder_ca=$CA
done

echo "== held-out CER trajectories =="
grep -h "eval:" /root/repo/outputs/cmp_dense/info.txt | tail -n $EPOCHS
grep -h "eval:" /root/repo/outputs/cmp_deform/info.txt | tail -n $EPOCHS
