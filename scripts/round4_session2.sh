#!/bin/bash
# Round-4 session 2 chip queue (runs after hwdb_real.sh frees the chip).
# The VM wipe between round-4 sessions ate outputs/ (finetune checkpoint,
# xla_cache) — the phase-B headline (natural-text CER 0.0036) had no
# weights behind it. This script makes the round's recognition state
# durable and closes the phase-E finding:
#   A. commit HWDB evidence (phase C), bank hwdb trunk npz
#   B. re-create the two-stage corpus-mixed finetune from the banked
#      pretrain npz (same recipe as round4_tail.sh phase B)
#   C. bank it (artifacts/r4ft_params*.npz) + confirmation eval at the
#      sweep winner TH/NMS — the re-created checkpoint must reproduce
#      the committed headline to ~the same order
#   D. phase E': 1000-step big-geometry adaptation finetune + re-eval
#      (zero-shot broke at CER 0.378; quantify what a short adaptation
#      recovers)
set -u
HARD_END=${R4S2_HARD_END:-$(( $(date +%s) + 14400 ))}
left() { echo $(( HARD_END - $(date +%s) )); }
log() { echo "[r4s2 $(date -u +%H:%M:%S)] $*"; }
cd /root/repo

bank_commit() { # bank_commit <msg> <paths...>
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: training-artifact/evidence bank, no source change" \
    && log "committed: $msg" || log "nothing to commit for: $msg"
}

SNAP=/tmp/r4s2_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
# APPEND to PYTHONPATH (axon sitecustomize must stay reachable)
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

# ---- A. HWDB evidence + trunk bank --------------------------------------
if [ -f outputs/r4_hwdb_console.log ]; then
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
    outputs/hwdb_real artifacts/r4hwdb_params --ema 2>/dev/null \
    && log "banked hwdb npz" || log "hwdb snapshot failed (no checkpoint?)"
  bank_commit "Round-4 HWDB multi-k pretrain + chinese AR/CR evidence" \
    outputs/r4_hwdb_console.log outputs/hwdb_real/log.txt \
    outputs/hwdb_real/info.txt outputs/hwdb_real/stats_dect \
    artifacts/r4hwdb_params.npz artifacts/r4hwdb_params_ema.npz
fi

# ---- B. finetune re-creation --------------------------------------------
OUT=/root/repo/outputs/finetune_r4b
NPZ=/root/repo/artifacts/r4run_params_ema.npz
COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

if [ "$(left)" -gt 6000 ]; then
  log "B1: heads-only finetune (1500 steps) from $NPZ"
  eval timeout 3000 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --pretrain_dir "$NPZ" \
    --output_dir "$OUT" --new_class_embedding --smart_mapping \
    --epochs 1 --seed 3 \
    --options max_iterations=1500 $COMMON_OPTS \
    || log "B1 FAILED (continuing: B2 resumes whatever exists)"
  log "B2: full-model finetune (6000 steps)"
  eval timeout 4800 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --output_dir "$OUT" \
    --resume_finetuning --epochs 2 --seed 4 \
    --options max_iterations=6000 $COMMON_OPTS \
    || log "B2 FAILED"
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
    "$OUT" artifacts/r4ft_params --ema 2>/dev/null \
    && log "banked finetune npz" || log "finetune snapshot failed"
  bank_commit "Bank re-created round-4 finetune weights (headline checkpoint, npz)" \
    outputs/finetune_r4b/log.txt outputs/finetune_r4b/info.txt \
    outputs/finetune_r4b/config_cfg.py \
    artifacts/r4ft_params.npz artifacts/r4ft_params_ema.npz
else
  log "skip B (deadline)"
fi

# ---- C. confirmation eval at the committed sweep winner ------------------
if [ "$(left)" -gt 1800 ] && [ -d "$OUT" ]; then
  log "C: natural-text confirmation eval at TH=0.1 NMS=0.4"
  eval timeout 1500 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
    --ckpt_dir "$OUT" --TH 0.1 --NMS 0.4 --max_images 200 --batch_size 8 \
    --options $COMMON_OPTS synthetic_corpus_prob=1.0 \
    > /root/repo/outputs/r4_ft_recreate_eval.log 2>&1 \
    && log "C: $(tail -1 /root/repo/outputs/r4_ft_recreate_eval.log)" \
    || log "C FAILED"
  bank_commit "Confirmation eval: re-created finetune reproduces the headline" \
    outputs/r4_ft_recreate_eval.log
fi

# ---- D. phase E': big-geometry adaptation --------------------------------
BIG=/root/repo/outputs/finetune_r4_bigscale
BIG_OPTS="batch_size=4 max_targets=256 'data_aug_scales=[480]' \
  data_aug_max_size=1333 image_w_max=1344 image_h_max=512 \
  synthetic_max_words=30 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 eval_set_size=32 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"
if [ "$(left)" -gt 3600 ] && [ -d "$OUT/checkpoint" ]; then
  log "D: big-geometry adaptation finetune (1000 steps from the re-created ckpt)"
  rm -rf "$BIG" && mkdir -p "$BIG"
  cp -r "$OUT/checkpoint" "$BIG/checkpoint"
  eval timeout 3600 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --output_dir "$BIG" \
    --resume_finetuning --epochs 3 --seed 5 \
    --options max_iterations=1000 $BIG_OPTS \
    || log "D adapt FAILED"
  log "D: adapted big-geometry eval"
  eval timeout 1800 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$BIG/config_cfg.py" \
    --ckpt_dir "$BIG" --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 4 \
    --options $BIG_OPTS synthetic_corpus_prob=1.0 \
    > /root/repo/outputs/r4_bigscale_adapted_eval.log 2>&1 \
    && log "D: $(tail -1 /root/repo/outputs/r4_bigscale_adapted_eval.log)" \
    || log "D eval FAILED"
  bank_commit "Phase E': big-geometry adaptation leg (zero-shot break -> adapted number)" \
    outputs/r4_bigscale_adapted_eval.log outputs/finetune_r4_bigscale/log.txt \
    outputs/finetune_r4_bigscale/info.txt
else
  log "skip D (deadline or no ckpt)"
fi
log "session2 queue done ($(left)s to spare)"
