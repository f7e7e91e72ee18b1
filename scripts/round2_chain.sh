#!/bin/bash
# Round-2 chip-run chain: wait for the bigrun pretrain (PID in
# /tmp/bigrun.pid) to finish, then run the stage-2/3 finetune+evaluate
# pipeline (VERDICT item 1, highest leverage) and then the
# dense-vs-deform CER comparison (VERDICT item 2), keeping the single
# TPU chip saturated back-to-back. A wall-clock deadline (epoch
# seconds) shrinks or skips later stages so the chip is free before
# the driver's round-end bench.
set -u
DEADLINE=${ROUND2_DEADLINE:-0}   # epoch seconds; 0 = no deadline

left() { [ "$DEADLINE" -eq 0 ] && echo 999999 || echo $(( DEADLINE - $(date +%s) )); }

# 1. wait for bigrun
if [ -f /tmp/bigrun.pid ]; then
  BP=$(cat /tmp/bigrun.pid)
  while kill -0 "$BP" 2>/dev/null; do sleep 30; done
fi
echo "[chain] bigrun done at $(date), $(left)s left"

# 2. stage-2 finetune + evaluate (~50 min)
if [ "$(left)" -gt 3600 ]; then
  if bash /root/repo/scripts/stage2_finetune.sh /root/repo/outputs/bigrun \
      > /root/repo/outputs/stage2_console.log 2>&1; then
    echo "[chain] stage2 done at $(date), $(left)s left"
  else
    echo "[chain] stage2 FAILED (see outputs/stage2_console.log), $(left)s left"
  fi
else
  echo "[chain] skipping stage2 (deadline)"
fi

# 3. decoder-CA comparison: 4 epochs each needs ~100 min; 2 epochs ~60
L=$(left)
if [ "$L" -gt 7200 ]; then CMP_EPOCHS=4
elif [ "$L" -gt 4500 ]; then CMP_EPOCHS=2
else CMP_EPOCHS=0; fi
if [ "$CMP_EPOCHS" -gt 0 ]; then
  if bash /root/repo/scripts/compare_decoder_ca.sh "$CMP_EPOCHS" \
      > /root/repo/outputs/cmp_console.log 2>&1; then
    echo "[chain] decoder comparison done"
  else
    echo "[chain] decoder comparison FAILED (see outputs/cmp_console.log)"
  fi
fi
echo "[chain] all done at $(date)"
