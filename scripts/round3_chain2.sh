#!/bin/bash
# Round-3 chip chain, re-scoped (replaces round3_chain.sh mid-flight).
#
# Why: the original chain let the pretrain run to its 19:30 UTC deadline
# and trusted the round to live until 22:30. PROGRESS.jsonl says round 3
# actually started 07:59 UTC; rounds 1-2 lasted ~10 h and ~14 h, so the
# round likely dies 20:00-22:00 — possibly mid-finetune, leaving NO
# stats.json and NO bench. This chain stops the pretrain early (~100k
# steps, still ~15k past the lr_drop at 85k) and front-loads the
# headline evidence: finetune->sweep->stats.json, n-gram delta, bench.
# Extras (HWDB smoke, dense-vs-deform) follow; any surplus time goes
# back into pretrain polish + a re-snapshot for round 4.
set -u
STOP_AT=${R3_STOP_AT:-1786984800}     # 16:40 UTC: stop pretrain
HARD_END=${R3_HARD_END:-1786998600}   # 20:30 UTC: conservative round end
left() { echo $(( HARD_END - $(date +%s) )); }
log() { echo "[chain2 $(date -u +%H:%M:%S)] $*"; }

# ---- 1. wait for STOP_AT (or natural pretrain exit), then stop it ----
PYPID=$(cat /tmp/r3py.pid 2>/dev/null || echo 0)
LOOPPID=$(cat /tmp/r3run.pid 2>/dev/null || echo 0)
while [ "$(date +%s)" -lt "$STOP_AT" ] && kill -0 "$PYPID" 2>/dev/null; do
  sleep 30
  # the restart loop may have relaunched python under a new pid
  PYPID=$(cat /tmp/r3py.pid 2>/dev/null || echo "$PYPID")
done
# kill the restart-loop first so it cannot relaunch, then the trainer.
# Checkpoints are written every epoch (~3 min), so <=1 epoch is lost.
kill "$LOOPPID" 2>/dev/null
PYPID=$(cat /tmp/r3py.pid 2>/dev/null || echo 0)
if kill -0 "$PYPID" 2>/dev/null; then
  log "stopping pretrain pid $PYPID"
  kill "$PYPID" 2>/dev/null
  for _ in $(seq 30); do kill -0 "$PYPID" 2>/dev/null || break; sleep 5; done
  kill -9 "$PYPID" 2>/dev/null
fi
sleep 5
log "pretrain stopped; $(left)s to HARD_END"

# ---- 2. snapshot pretrained weights to committed-size npz ----
# PYTHONPATH= skips the axon sitecustomize: plain CPU jax, no device
# claim wait after the SIGKILLed client
(cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
  outputs/r3run artifacts/r3run_params --ema) \
  && log "snapshot ok" || log "snapshot FAILED"

# ---- 3. two-stage CTC finetune + TH x NMS sweep -> stats.json ----
if bash /root/repo/scripts/stage3_finetune.sh /root/repo/outputs/r3run 1500 6000 \
    > /root/repo/outputs/stage3_console.log 2>&1; then
  log "finetune+sweep OK"
else
  log "finetune+sweep FAILED (see outputs/stage3_console.log)"
fi

# ---- 4. n-gram greedy-vs-rescored comparison (needs finetune) ----
if [ "$(left)" -gt 600 ]; then
  if bash /root/repo/scripts/ngram_compare.sh \
      > /root/repo/outputs/ngram_console.log 2>&1; then
    log "ngram compare OK"
  else
    log "ngram compare FAILED (see outputs/ngram_console.log)"
  fi
else
  log "skipping ngram (deadline)"
fi

# ---- 5. flagship bench with MFU (persistent compile cache) ----
if [ "$(left)" -gt 1200 ]; then
  if (cd /root/repo && timeout 2400 python bench.py \
      > outputs/bench_r3.json 2> outputs/bench_r3.err); then
    log "bench: $(cat /root/repo/outputs/bench_r3.json)"
  else
    log "bench FAILED (see outputs/bench_r3.err)"
  fi
else
  log "skipping bench (deadline)"
fi

# ---- 6. chinese-path smoke ----
if [ "$(left)" -gt 2000 ]; then
  if bash /root/repo/scripts/hwdb_smoke.sh \
      > /root/repo/outputs/hwdb_console.log 2>&1; then
    log "hwdb smoke OK"
  else
    log "hwdb smoke FAILED (see outputs/hwdb_console.log)"
  fi
else
  log "skipping hwdb smoke (deadline)"
fi

# ---- 7. dense-vs-deform matched-budget adaptation (r2 VERDICT #4) ----
if [ "$(left)" -gt 3000 ]; then
  if bash /root/repo/scripts/deform_adapt.sh \
      > /root/repo/outputs/da_console.log 2>&1; then
    log "deform-adapt OK"
  else
    log "deform-adapt FAILED (see outputs/da_console.log)"
  fi
else
  log "skipping deform-adapt (deadline)"
fi

# ---- 8. per-round Mosaic lowering re-probe ----
if [ "$(left)" -gt 500 ]; then
  (cd /root/repo && timeout 400 python scripts/pallas_probe.py \
     > outputs/pallas_probe_r3.log 2>&1)
  log "pallas probe: $(tail -1 /root/repo/outputs/pallas_probe_r3.log)"
fi

# ---- 9. surplus time -> pretrain polish + re-snapshot for round 4 ----
if [ "$(left)" -gt 1500 ]; then
  POLISH_DL=$(( HARD_END - 600 ))
  log "resuming pretrain polish until $POLISH_DL"
  R3_DEADLINE=$POLISH_DL R3_EPOCHS=200 \
    bash /root/repo/scripts/round3_pretrain.sh \
    > /root/repo/outputs/r3polish_console.log 2>&1
  (cd /root/repo && env PYTHONPATH= python scripts/snapshot_params.py \
    outputs/r3run artifacts/r3run_params --ema) \
    && log "polish re-snapshot ok" || log "polish re-snapshot FAILED"
else
  log "no polish time"
fi
log "all done"
