#!/bin/bash
# Phase E'' (round-5): continue the big-geometry adaptation.
#
# Phase E' (scripts/round5_bigscale_retry.sh) proved the recipe
# scale-adapts: 1000 steps took the fixed-op CER from 0.354 (zero-shot)
# to 0.139 with the in-train CER still falling (first-half >> second-half
# of the epoch). This leg continues from that checkpoint (fp32 npz
# snapshot of outputs/r5_bigscale @ step 1000) for BIG_STEPS more
# full-model steps at the same protocol geometry (min-side 480, <=1333,
# up-to-30-word lines; reference config/coco_transformer.py:1-2,
# datasets/synthetic_lines_general.py:163-183), then re-evals at the
# reference fixed operating point and banks a durable npz.
set -u
cd /root/repo
log() { echo "[r5big2 $(date -u +%H:%M:%S)] $*"; }

bank_commit() {
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: training-artifact/evidence bank, no source change" \
    && log "committed: $msg" || log "nothing to commit for: $msg"
}

SNAP=/tmp/r5_src3
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

# BIG_TAG names the leg (output dir outputs/r5_<tag>, npz artifacts/r5_<tag>.npz)
# so deeper continuation legs (E''', ...) reuse this script with
# BIG_TAG=bigscale3 BIG_NPZ=<fp32 snapshot of the previous leg> BIG_STEPS=...
TAG=${BIG_TAG:-bigscale2}
BIG=/root/repo/outputs/r5_$TAG
# warm start: fp32 snapshot of the phase-E' 1000-step adapted checkpoint
# (outputs/r5_bigscale/checkpoint @ step 1000; the fp16 bank of the same
# state is artifacts/r5_bigscale_1k.npz)
NPZ=${BIG_NPZ:-/tmp/r5big1k_fp32.npz}
if [ ! -f "$NPZ" ]; then
  log "fp32 snapshot missing; re-exporting from outputs/r5_bigscale"
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
    outputs/r5_bigscale /tmp/r5big1k_fp32 --fp32 || exit 1
fi
BIG_OPTS="batch_size=${BIG_BS:-2} max_targets=256 'data_aug_scales=[480]' \
  data_aug_max_size=1333 image_w_max=1344 image_h_max=512 \
  synthetic_max_words=30 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True flash_attn=${BIG_FLASH:-True} \
  use_checkpoint=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 eval_set_size=32 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

log "E'': +${BIG_STEPS:-4000} big-geometry steps from the 1k checkpoint"
rm -rf "$BIG" && mkdir -p "$BIG"
eval timeout ${BIG_TIMEOUT:-12600} python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$BIG" \
  --pretrain_dir "$NPZ" --full_model --epochs 1 --seed ${BIG_SEED:-6} \
  --options max_iterations=${BIG_STEPS:-4000} $BIG_OPTS
rc=$?
[ $rc -ne 0 ] && log "E'' adapt rc=$rc (timeout=124 keeps the checkpoint)"
[ ! -d "$BIG/checkpoint" ] && { log "no checkpoint written; abort"; exit 1; }

log "E'': banking durable npz before eval"
env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
  "$BIG" artifacts/r5_${TAG}_params && \
  bank_commit "Bank the $TAG big-geometry checkpoint npz" \
    artifacts/r5_${TAG}_params.npz

log "E'': adapted eval (fixed op TH 0.3 / NMS 0.5, same protocol as E')"
eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$BIG/config_cfg.py" \
  --ckpt_dir "$BIG" --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 4 \
  --options $BIG_OPTS synthetic_corpus_prob=1.0 \
  > /root/repo/outputs/r5_${TAG}_eval.log 2>&1 \
  && log "E'' eval: $(tail -1 /root/repo/outputs/r5_${TAG}_eval.log)" \
  || log "E'' eval FAILED"

bank_commit "Phase E'' continuation: +${BIG_STEPS:-4000} big-geometry steps + fixed-op eval" \
  outputs/r5_${TAG}_eval.log outputs/r5_$TAG/log.txt \
  outputs/r5_$TAG/info.txt outputs/r5_$TAG/config_cfg.py
log "done"
