#!/bin/bash
# Phase E' retry (round-5). The chain's first attempt OOMed HBM on the
# very first big-geometry train step: at 512x1344 the encoder memory is
# S~14280 keys and the materialized dense decoder-CA stores six
# (B, 8, 900, S) fp32 score tensors as backward residuals (~10 GB at
# B=4) on top of everything else. Fix: flash_attn=True — the fused
# kernel (ops/flash_attn.py) keeps scores in VMEM so the residuals are
# just Q/K/V, and its recompute backward materializes scores one layer
# at a time transiently — plus batch_size=2 headroom.
# TPU-validated first by scripts/flash_probe.py (parity + grads + VMEM
# fit at S=14280; see docs/evidence/r5_flash_probe.log).
set -u
cd /root/repo
log() { echo "[r5big $(date -u +%H:%M:%S)] $*"; }

bank_commit() {
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: training-artifact/evidence bank, no source change" \
    && log "committed: $msg" || log "nothing to commit for: $msg"
}

SNAP=/tmp/r5_src2
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

BIG=/root/repo/outputs/r5_bigscale
# warm start: the r4b orbax checkpoint was wiped with the VM; the banked
# npz snapshot (artifacts/r4ft_params.npz, the headline checkpoint) is
# the durable copy — load it via --pretrain_dir + --full_model (stage-2
# optimizer from an npz, see train/finetune.py)
NPZ=${BIG_NPZ:-/root/repo/artifacts/r4ft_params.npz}
BIG_OPTS="batch_size=${BIG_BS:-2} max_targets=256 'data_aug_scales=[480]' \
  data_aug_max_size=1333 image_w_max=1344 image_h_max=512 \
  synthetic_max_words=30 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True flash_attn=${BIG_FLASH:-True} \
  use_checkpoint=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 eval_set_size=32 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

log "B retry: big-geometry adaptation (bs=${BIG_BS:-2} flash=${BIG_FLASH:-True})"
rm -rf "$BIG" && mkdir -p "$BIG"
eval timeout 7200 python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$BIG" \
  --pretrain_dir "$NPZ" --full_model --epochs 1 --seed 5 \
  --options max_iterations=${BIG_STEPS:-1000} $BIG_OPTS \
  || { log "B adapt FAILED"; exit 1; }

log "B retry: adapted big-geometry eval (fixed op TH 0.3 / NMS 0.5)"
eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$BIG/config_cfg.py" \
  --ckpt_dir "$BIG" --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 4 \
  --options $BIG_OPTS synthetic_corpus_prob=1.0 \
  > /root/repo/outputs/r5_bigscale_adapted_eval.log 2>&1 \
  && log "B eval: $(tail -1 /root/repo/outputs/r5_bigscale_adapted_eval.log)" \
  || log "B eval FAILED"

bank_commit "Phase E' retry: flash-decoder big-geometry adaptation + eval" \
  outputs/r5_bigscale_adapted_eval.log outputs/r5_bigscale/log.txt \
  outputs/r5_bigscale/info.txt outputs/r5_bigscale/config_cfg.py
log "done"
