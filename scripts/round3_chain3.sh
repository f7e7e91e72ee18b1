#!/bin/bash
# Round-3 extension chip chain (the round-3 driver restarted ~22:04 UTC
# with a fresh ~12h budget; the 19:45 deadline cap in round3_pretrain.sh
# turned out to be early — this chain reuses the surplus).
#
# Plan (UTC, Aug 18):
#   A. resume the 86k-step GN trunk (outputs/r3run) with the lr re-warmed
#      to 1e-4 (the 73k lr_drop was a deadline artifact: the pre-drop
#      curve was still falling ~0.004 nms_cer / 2k steps, post-drop it
#      flattened at ~0.225-0.231 for 14k steps) until PHASE_A_END.
#   B. re-drop to 1e-5 (lr_drop=1) for a final polish hour.
#   C. tail: snapshot -> two-stage finetune + THxNMS sweep -> n-gram
#      compare -> bench -> HWDB warm-started multi-k pretrain (first
#      non-zero AR/CR attempt) -> pallas probe -> surplus polish at 1e-5
#      until POLISH_CAP, final re-snapshot.
# Checkpoint @86000 is backed up at outputs/r3run_ckpt86k_backup in case
# the re-warm destabilises the trunk.
set -u
PHASE_A_END=${C3_A_END:-$(date -d '2026-08-18 04:20 UTC' +%s)}
PHASE_B_END=${C3_B_END:-$(date -d '2026-08-18 05:20 UTC' +%s)}
POLISH_CAP=${C3_CAP:-$(date -d '2026-08-18 09:15 UTC' +%s)}
log() { echo "[chain3 $(date -u +%H:%M:%S)] $*"; }
left() { echo $(( POLISH_CAP - $(date +%s) )); }

# ---- A. re-warmed continuation ----
log "phase A: resume r3run at lr 1e-4 until $(date -ud @$PHASE_A_END +%H:%M)"
R3_DEADLINE=$PHASE_A_END R3_DEADLINE_CAP=$PHASE_A_END R3_EPOCHS=400 \
  R3_EXTRA="lr_drop=500" \
  bash /root/repo/scripts/round3_pretrain.sh \
  > /root/repo/outputs/r3ext_a_console.log 2>&1
log "phase A done: $(grep '"eval"' /root/repo/outputs/r3run/log.txt | tail -1 | cut -c1-220)"

# ---- B. re-drop polish ----
log "phase B: lr 1e-5 polish until $(date -ud @$PHASE_B_END +%H:%M)"
R3_DEADLINE=$PHASE_B_END R3_DEADLINE_CAP=$PHASE_B_END R3_EPOCHS=400 \
  R3_EXTRA="lr_drop=1" \
  bash /root/repo/scripts/round3_pretrain.sh \
  > /root/repo/outputs/r3ext_b_console.log 2>&1
log "phase B done: $(grep '"eval"' /root/repo/outputs/r3run/log.txt | tail -1 | cut -c1-220)"

# ---- C1. snapshot ----
(cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
  outputs/r3run artifacts/r3run_params --ema) \
  && log "snapshot ok" || log "snapshot FAILED"

# ---- C2. finetune + sweep -> stats.json (fresh outputs/finetune_r3;
#      the round-3 original was archived to finetune_r3_r3final) ----
if bash /root/repo/scripts/stage3_finetune.sh /root/repo/outputs/r3run 1500 6000 \
    > /root/repo/outputs/stage4_console.log 2>&1; then
  log "finetune+sweep OK"
else
  log "finetune+sweep FAILED (see outputs/stage4_console.log)"
fi

# ---- C3. n-gram greedy-vs-rescored ----
if bash /root/repo/scripts/ngram_compare.sh \
    > /root/repo/outputs/ngram2_console.log 2>&1; then
  log "ngram compare OK"
else
  log "ngram compare FAILED (see outputs/ngram2_console.log)"
fi

# ---- C4. bench ----
if (cd /root/repo && timeout 2400 python bench.py \
    > outputs/bench_r3b.json 2> outputs/bench_r3b.err); then
  log "bench: $(cat /root/repo/outputs/bench_r3b.json)"
else
  log "bench FAILED (see outputs/bench_r3b.err)"
fi

# ---- C5. HWDB warm-started multi-k pretrain + chinese AR/CR ----
if [ "$(left)" -gt 4500 ]; then
  if bash /root/repo/scripts/hwdb_real.sh \
      > /root/repo/outputs/hwdb_real_console.log 2>&1; then
    log "hwdb real OK"
  else
    log "hwdb real FAILED (see outputs/hwdb_real_console.log)"
  fi
else
  log "skipping hwdb real (deadline)"
fi

# ---- C6. Mosaic lowering re-probe ----
(cd /root/repo && timeout 400 python scripts/pallas_probe.py \
   > outputs/pallas_probe_r3x.log 2>&1)
log "pallas probe: $(tail -1 /root/repo/outputs/pallas_probe_r3x.log)"

# ---- C7. surplus polish + re-snapshot ----
if [ "$(left)" -gt 1500 ]; then
  POLISH_DL=$(( POLISH_CAP - 600 ))
  log "surplus polish until $(date -ud @$POLISH_DL +%H:%M)"
  R3_DEADLINE=$POLISH_DL R3_DEADLINE_CAP=$POLISH_DL R3_EPOCHS=400 \
    R3_EXTRA="lr_drop=1" \
    bash /root/repo/scripts/round3_pretrain.sh \
    > /root/repo/outputs/r3ext_c_console.log 2>&1
  (cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
    outputs/r3run artifacts/r3run_params --ema) \
    && log "polish re-snapshot ok" || log "polish re-snapshot FAILED"
else
  log "no polish time"
fi
log "all done"
