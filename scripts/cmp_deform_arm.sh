#!/bin/bash
# Deformable arm of the decoder-CA comparison (VERDICT item 2), run
# standalone for N epochs (default 1) to match the dense arm's
# completed budget in outputs/cmp_dense. Identical settings/seed to
# scripts/compare_decoder_ca.sh, only decoder_ca differs.
set -e
EPOCHS=${1:-1}
SNAP=/tmp/cmp_deform_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

eval python -m dtlr_tpu.train.pretrain \
  -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
  --output_dir /root/repo/outputs/cmp_deform \
  --epochs $EPOCHS --dataset_file synthetic_line_OCR_general \
  --steps_per_epoch 1000 --eval_every 1 --seed 11 \
  --options batch_size=8 use_ema=False warmup_steps=500 max_targets=64 \
  "'data_aug_scales=[128]'" data_aug_max_size=1024 image_w_max=1024 \
  image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
  enc_layers=4 dec_layers=4 num_queries=500 dn_number=50 lr_drop=40 \
  decoder_ca=deform
