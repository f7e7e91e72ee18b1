#!/bin/bash
# Round-3 extension chain, take 3 (VM wiped ~06:22 UTC Aug 18; the 94k
# trunk orbax checkpoints and the whole outputs/ tree are gone — only
# the committed artifacts/r3run_params*.npz @86k snapshots survive).
#
# This chain restarts the CLEAN-DATA trunk continuation (chain4 phase A
# intent) from the banked 86k weights via --warm_start_npz.  The lease
# mechanism replaces the fixed phase gates: the session renews
# /tmp/r3_lease (epoch seconds) while it is alive; the trainer's
# --deadline is set to the lease each launch, and the loop exits when
# the lease is stale.  A dead session therefore frees the chip within
# one epoch (~4 min) of the last renewed lease, keeping the driver's
# round-end bench unblocked no matter when the round actually ends.
set -u
SNAP=/tmp/r3run_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
OUT=${R3_OUT:-/root/repo/outputs/r3run}
WARM=${R3_WARM:-/root/repo/artifacts/r3run_params.npz}
LEASE_FILE=/tmp/r3_lease
log() { echo "[chain5 $(date -u +%H:%M:%S)] $*"; }

while :; do
  LEASE=$(cat "$LEASE_FILE" 2>/dev/null || echo 0)
  NOW=$(date +%s)
  if [ "$LEASE" -le "$NOW" ]; then
    log "lease $LEASE expired (now $NOW) — stopping, chip free"
    break
  fi
  log "launching trainer with deadline $(date -ud @$LEASE +%H:%M:%S)"
  python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir "$OUT" \
    --warm_start_npz "$WARM" \
    --steps_per_epoch 500 --eval_every 4 --seed 0 \
    --epochs 400 --deadline "$LEASE" \
    --options batch_size=8 use_ema=True warmup_steps=200 \
      max_targets=64 'data_aug_scales=[128]' data_aug_max_size=1024 \
      image_w_max=1024 image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
      save_checkpoint_interval=20 lr_drop=1000 rss_restart_gb=80 \
      batch_norm_type=group lr_backbone=1e-4 ${R3_EXTRA:-} &
  PYPID=$!
  echo "$PYPID" > /tmp/r3py.pid
  # stall watchdog (see round3_pretrain.sh: orbax save once wedged 15 min)
  while kill -0 "$PYPID" 2>/dev/null; do
    sleep 60
    last=$(stat -c %Y "$OUT/info.txt" 2>/dev/null || echo "$(date +%s)")
    gap=$(( $(date +%s) - last ))
    if [ "$gap" -gt 1200 ]; then
      log "watchdog: log stalled ${gap}s — killing $PYPID"
      kill "$PYPID"; sleep 10; kill -9 "$PYPID" 2>/dev/null
    fi
  done
  wait "$PYPID"
  code=$?
  log "trainer exited $code"
  [ "$code" -eq 3 ] && continue        # RSS restart: relaunch immediately
  sleep 5
done
# bank whatever the last checkpoint holds
(cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
  outputs/r3run artifacts/r3run_params --ema) \
  && log "final snapshot banked" || log "final snapshot FAILED"
