#!/bin/bash
# Dense-CA box-locality prior ablation (round-3 follow-up (a), commit
# 481186b): does `dense_box_bias=True` — deformable attention's
# box-guided locality prior injected as an additive Gaussian log-bias on
# the dense QxS logits — improve recognition at matched budget?
#
# Both arms warm-start the full round-3 trunk from the @86k params
# snapshot (the new per-head ca_box_gamma params are absent from the
# npz, so merge_params_npz leaves them at init: gamma=1, prior live) and
# train BB_STEPS on the same stream/seed with a fresh optimizer.
# Compare end-of-run held-out evals (nms_cer first, then greedy CER and
# confidence stats). Decision rule: flip the flagship default to
# dense_box_bias=True iff the bias arm's nms_cer is no worse AND either
# greedy CER or nms_cer improves by more than the seed-noise scale seen
# in the round-3 dense-vs-deform comparison (~0.02 nms).
# Reference behavior being distilled: models/dino/deformable_transformer.py
# decoder CA samples n_points around the query's reference box.
set -u
STEPS=${BB_STEPS:-2000}
NPZ=${BB_NPZ:-/root/repo/artifacts/r3run_params.npz}
SNAP=/tmp/bb_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 eval_set_size=200 warmup_steps=200 \
  lr_drop=1000000 batch_norm_type=group lr_backbone=1e-4 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

for arm in off on; do
  [ "$arm" = on ] && BIAS=True || BIAS=False
  if ! eval python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir /root/repo/outputs/bb_$arm \
    --warm_start_npz "$NPZ" \
    --steps_per_epoch "$STEPS" --epochs 1 --eval_every 1 --seed 12 \
    --options decoder_ca=dense dense_box_bias=$BIAS $OPTS; then
    echo "[bb] $arm arm FAILED"; exit 1
  fi
  echo "[bb] $arm eval: $(grep '"eval"' /root/repo/outputs/bb_$arm/log.txt | tail -1)"
done
echo "[bb] ablation done"
