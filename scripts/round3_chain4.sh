#!/bin/bash
# Round-3 extension chain, take 2 (driver restarted 03:43 UTC Aug 18
# with a fresh ~12h budget; chain3's 04:20/05:20/09:15 gates were scoped
# to the previous budget and the backend outage burned phase A idle).
#
# The headline job is the CLEAN-DATA trunk continuation: commit ebc6b7a
# fixed the blank-font bug (21.5% of synthetic train/eval lines were
# blank images with labels — the direct cause of the 0.225 nms_cer
# plateau and the greedy insertion flooding).  Every step from here on
# carries ~27% more signal and no hallucinate-on-empty incentive, and
# the eval set itself is now clean (expect a discontinuous drop in
# nms_cer at the first post-fix eval).
#
# Plan (UTC, Aug 18):
#   A. resume the 94k-step GN trunk (outputs/r3run) at lr 1e-4 on clean
#      data until PHASE_A_END (11:30).  The backend has been UNAVAILABLE
#      since 23:24 Aug 17; round3_pretrain.sh's watchdog loop keeps
#      retrying and auto-resumes the moment it returns.
#   B. lr re-drop to 1e-5 polish until PHASE_B_END (12:10).
#   C. tail: snapshot -> two-stage finetune + THxNMS sweep -> n-gram
#      compare -> bench -> HWDB warm-started multi-k pretrain (gated on
#      time left) -> pallas probe -> final re-snapshot.  Everything off
#      the chip by POLISH_CAP (15:10) so the driver's round-end bench
#      gets a free device.
set -u
PHASE_A_END=${C4_A_END:-$(date -d '2026-08-18 11:30 UTC' +%s)}
PHASE_B_END=${C4_B_END:-$(date -d '2026-08-18 12:10 UTC' +%s)}
POLISH_CAP=${C4_CAP:-$(date -d '2026-08-18 15:10 UTC' +%s)}
log() { echo "[chain4 $(date -u +%H:%M:%S)] $*"; }
left() { echo $(( POLISH_CAP - $(date +%s) )); }

# ---- A. clean-data continuation at lr 1e-4 ----
log "phase A: resume r3run on clean data at lr 1e-4 until $(date -ud @$PHASE_A_END +%H:%M)"
R3_DEADLINE=$PHASE_A_END R3_DEADLINE_CAP=$PHASE_A_END R3_EPOCHS=400 \
  R3_EXTRA="lr_drop=500" \
  bash /root/repo/scripts/round3_pretrain.sh \
  > /root/repo/outputs/r3ext2_a_console.log 2>&1
log "phase A done: $(grep '"eval"' /root/repo/outputs/r3run/log.txt | tail -1 | cut -c1-220)"

# ---- B. re-drop polish ----
log "phase B: lr 1e-5 polish until $(date -ud @$PHASE_B_END +%H:%M)"
R3_DEADLINE=$PHASE_B_END R3_DEADLINE_CAP=$PHASE_B_END R3_EPOCHS=400 \
  R3_EXTRA="lr_drop=1" \
  bash /root/repo/scripts/round3_pretrain.sh \
  > /root/repo/outputs/r3ext2_b_console.log 2>&1
log "phase B done: $(grep '"eval"' /root/repo/outputs/r3run/log.txt | tail -1 | cut -c1-220)"

# ---- C1. snapshot ----
(cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
  outputs/r3run artifacts/r3run_params --ema) \
  && log "snapshot ok" || log "snapshot FAILED"

# ---- C2. finetune + sweep -> stats.json (clean-data arm; writes the
#      outputs/finetune_r3 path the ngram yamls point at — the round-3
#      original was archived to finetune_r3_r3final) ----
if bash /root/repo/scripts/stage3_finetune.sh /root/repo/outputs/r3run 1500 6000 \
    > /root/repo/outputs/stage5_console.log 2>&1; then
  log "finetune+sweep OK: $(grep -o '"best[^,]*' /root/repo/outputs/finetune_r3/stats_dect/stats.json 2>/dev/null | head -2 | tr '\n' ' ')"
else
  log "finetune+sweep FAILED (see outputs/stage5_console.log)"
fi

# ---- C3. n-gram greedy-vs-rescored on the new finetune ----
if bash /root/repo/scripts/ngram_compare.sh \
    > /root/repo/outputs/ngram3_console.log 2>&1; then
  log "ngram compare OK"
else
  log "ngram compare FAILED (see outputs/ngram3_console.log)"
fi

# ---- C4. bench ----
if (cd /root/repo && timeout 2400 python bench.py \
    > outputs/bench_r3c.json 2> outputs/bench_r3c.err); then
  log "bench: $(cat /root/repo/outputs/bench_r3c.json)"
else
  log "bench FAILED (see outputs/bench_r3c.err)"
fi

# ---- C5. HWDB warm-started multi-k pretrain + chinese AR/CR ----
if [ "$(left)" -gt 5400 ]; then
  if bash /root/repo/scripts/hwdb_real.sh \
      > /root/repo/outputs/hwdb_real_console.log 2>&1; then
    log "hwdb real OK: $(tail -2 /root/repo/outputs/hwdb_real_console.log | head -1 | cut -c1-200)"
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
if [ "$(left)" -gt 1800 ]; then
  POLISH_DL=$(( POLISH_CAP - 900 ))
  log "surplus polish until $(date -ud @$POLISH_DL +%H:%M)"
  R3_DEADLINE=$POLISH_DL R3_DEADLINE_CAP=$POLISH_DL R3_EPOCHS=400 \
    R3_EXTRA="lr_drop=1" \
    bash /root/repo/scripts/round3_pretrain.sh \
    > /root/repo/outputs/r3ext2_c_console.log 2>&1
fi
(cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
  outputs/r3run artifacts/r3run_params --ema) \
  && log "final re-snapshot ok" || log "final re-snapshot FAILED"
log "all done"
