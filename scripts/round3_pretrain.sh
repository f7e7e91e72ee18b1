#!/bin/bash
# Round-3 flagship pretrain: GroupNorm from-scratch recipe (ablation
# winner, see ROUND3_NOTES.md), full Latin flagship geometry, as many
# steps as the wall-clock budget allows (R3_DEADLINE, epoch seconds).
#
# Continues outputs/abl_gn if present (the ablation arm IS the first
# epochs of this run: same config, data stream, and seed).
set -u
SNAP=/tmp/r3run_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
EPOCHS=${R3_EPOCHS:-100}
DEADLINE=${R3_DEADLINE:-0}
OUT=${R3_OUT:-/root/repo/outputs/r3run}
EXTRA=${R3_EXTRA:-}
# Safety clamp: the driver's end-of-round bench.py needs the chip free
# (round-2 boundary evidence: BENCH_r02 ran 07:01, round 3 began 07:59).
# A trainer still holding the TPU when the round dies would block that
# device claim, so never train past R3_DEADLINE_CAP (default 19:45 UTC
# today); a live session can relaunch with a later cap if the round
# survives.
CAP=${R3_DEADLINE_CAP:-1786995900}
if [ "$CAP" -gt "$(date +%s)" ]; then     # a stale (past) cap is ignored
  if [ "$DEADLINE" -eq 0 ] || [ "$DEADLINE" -gt "$CAP" ]; then
    DEADLINE=$CAP
  fi
fi

while :; do
  python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir "$OUT" \
    --steps_per_epoch 1000 --eval_every 2 --seed 0 \
    --epochs "$EPOCHS" --deadline "$DEADLINE" \
    --options batch_size=8 use_ema=True warmup_steps=1000 \
      max_targets=64 'data_aug_scales=[128]' data_aug_max_size=1024 \
      image_w_max=1024 image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
      save_checkpoint_interval=10 lr_drop=44 rss_restart_gb=80 \
      batch_norm_type=group lr_backbone=1e-4 $EXTRA &
  PYPID=$!
  echo "$PYPID" > /tmp/r3py.pid
  # stall watchdog: a device-to-host transfer inside an orbax save once
  # wedged for 15+ min (futex wait, no progress); if the run log goes
  # quiet far beyond any legitimate gap (first compile ~13 min, epoch
  # eval ~4 min), kill the trainer — the loop restarts and auto-resumes
  # from the last epoch checkpoint with the persistent compile cache.
  while kill -0 "$PYPID" 2>/dev/null; do
    sleep 60
    last=$(stat -c %Y "$OUT/info.txt" 2>/dev/null || echo "$(date +%s)")
    gap=$(( $(date +%s) - last ))
    if [ "$gap" -gt 900 ]; then
      echo "[r3run watchdog] log stalled ${gap}s — killing $PYPID"
      kill "$PYPID"; sleep 10; kill -9 "$PYPID" 2>/dev/null
    fi
  done
  wait "$PYPID"
  code=$?
  [ "$code" -eq 0 ] && break
  [ "$code" -eq 3 ] || sleep 10
  echo "[r3run loop] restarting after exit $code"
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[r3run loop] past deadline after failure — stopping"
    break
  fi
done
echo "[r3run] pretrain finished, exit $code"
