#!/bin/bash
# Round-3 stages 2+3: two-stage CTC finetune onto the 64-char no-accent
# synthetic target from the round-3 GroupNorm pretrain, then the
# standalone evaluator TH x NMS sweep -> stats.json.
# Same protocol as round-2's stage2_finetune.sh, with the GN recipe
# options so the restored param structure matches, and per-stage status.
#
# Usage: bash scripts/stage3_finetune.sh <pretrain_dir_or_npz> [steps1] [steps2] [out_dir]
set -u
PRE=${1:-/root/repo/outputs/r3run}
S1=${2:-1500}
S2=${3:-4000}
OUT=${4:-/root/repo/outputs/finetune_r3}
SNAP=/tmp/stage3_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

# natural-text mixing: half the finetune lines render windows of the
# harvested prose corpus (reference pretrain draws wikitext text half
# the time); the val generator uses the disjoint val split, so the
# per-epoch finetune eval doubles as a natural-text CER probe.
COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent eval_epoch=1 \
  batch_norm_type=group \
  compilation_cache_dir=/root/repo/outputs/xla_cache"
CW_TRAIN=/root/repo/outputs/corpus_words_train_big.txt
CW_VAL=/root/repo/outputs/corpus_words_val.txt
if [ ! -s "$CW_TRAIN" ]; then     # harvested corpus is regenerable
  (cd /root/repo && env PYTHONPATH= python scripts/harvest_corpus.py \
     outputs/corpus_words 40000 \
   && cp outputs/corpus_words_train.txt "$CW_TRAIN") || true
fi
if [ -s "$CW_TRAIN" ] && [ -s "$CW_VAL" ]; then
  COMMON_OPTS="$COMMON_OPTS synthetic_corpus_file=$CW_TRAIN \
    synthetic_corpus_val_file=$CW_VAL synthetic_corpus_prob=0.5"
else
  echo "[stage3] no words corpus — finetuning on random-char lines only"
fi

# stage 1: fresh class heads + smart mapping, heads-only optimizer
if ! eval timeout 3600 python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --pretrain_dir "$PRE" \
  --output_dir "$OUT" --new_class_embedding --smart_mapping \
  --epochs 1 --seed 3 \
  --options max_iterations=$S1 $COMMON_OPTS; then
  echo "[stage3] stage-1 finetune FAILED"; exit 1
fi
echo "[stage3] stage-1 done"

# stage 2: resume, full model
if ! eval timeout 5400 python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$OUT" \
  --resume_finetuning --epochs 2 --seed 4 \
  --options max_iterations=$S2 $COMMON_OPTS; then
  echo "[stage3] stage-2 finetune FAILED"; exit 1
fi
echo "[stage3] stage-2 done"

# evaluate: greedy + NMS sweep -> stats.json
if ! eval timeout 3600 python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" --sweep --max_images 200 --batch_size 8 \
  --options $COMMON_OPTS; then
  echo "[stage3] evaluator sweep FAILED"; exit 1
fi
echo "[stage3] sweep done"
