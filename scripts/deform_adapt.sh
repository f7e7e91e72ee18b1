#!/bin/bash
# Matched-budget dense-vs-deform decoder-CA comparison at recognition
# quality (r2 VERDICT item 4). Both arms warm-start from the round-3
# long-run params snapshot (same trunk: backbone/encoder/heads), get a
# fresh optimizer, and train DA_STEPS on the same synthetic stream and
# seed; compared by the end-of-run held-out eval (greedy CER, nms_cer,
# confidence stats) in each arm's log.txt. The deform arm's decoder CA
# weights start fresh (merge_params_npz leaves non-matching leaves at
# init) — the dense arm's are warm, so a deform win is strong evidence
# for the box-guided sampling prior, a small deform loss is not
# conclusive. Reference arm: models/dino/deformable_transformer.py
# decoder cross-attention vs this repo's dense QxS formulation.
set -u
STEPS=${DA_STEPS:-2000}
NPZ=${DA_NPZ:-/root/repo/artifacts/r4run_params.npz}
SNAP=/tmp/da_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 eval_set_size=200 warmup_steps=200 \
  lr_drop=1000000 batch_norm_type=group lr_backbone=1e-4 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

for arm in dense deform; do
  if ! eval python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir /root/repo/outputs/da_$arm \
    --warm_start_npz "$NPZ" \
    --steps_per_epoch "$STEPS" --epochs 1 --eval_every 1 --seed 11 \
    --options decoder_ca=$arm $OPTS; then
    echo "[da] $arm arm FAILED"; exit 1
  fi
  echo "[da] $arm eval: $(grep '"eval"' /root/repo/outputs/da_$arm/log.txt | tail -1)"
done
echo "[da] comparison done"
