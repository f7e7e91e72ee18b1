#!/bin/bash
# Round-3 chip chain: wait for the long pretrain (PID in /tmp/r3run.pid)
# -> snapshot weights -> two-stage CTC finetune + TH x NMS sweep ->
# n-gram rescore comparison -> HWDB chinese smoke. Per-stage status is
# captured and echoed (a failed stage no longer reads as success).
set -u
DEADLINE=${ROUND3_DEADLINE:-0}
left() { [ "$DEADLINE" -eq 0 ] && echo 999999 || echo $(( DEADLINE - $(date +%s) )); }

if [ -f /tmp/r3run.pid ]; then
  BP=$(cat /tmp/r3run.pid)
  while kill -0 "$BP" 2>/dev/null; do sleep 30; done
fi
echo "[chain] pretrain done at $(date), $(left)s left"

# snapshot pretrained weights to committed-size npz (VM-wipe survival)
python /root/repo/scripts/snapshot_params.py /root/repo/outputs/r3run \
  /root/repo/artifacts/r3run_params --ema \
  && echo "[chain] snapshot ok" || echo "[chain] snapshot FAILED"

# two-stage finetune + evaluator sweep (~50-70 min)
if [ "$(left)" -gt 3000 ]; then
  if bash /root/repo/scripts/stage3_finetune.sh /root/repo/outputs/r3run \
      > /root/repo/outputs/stage3_console.log 2>&1; then
    echo "[chain] finetune+sweep OK"
  else
    echo "[chain] finetune+sweep FAILED (see outputs/stage3_console.log)"
  fi
else
  echo "[chain] skipping finetune (deadline)"
fi

# n-gram rescore greedy-vs-ngram comparison on the finetuned model
if [ "$(left)" -gt 1500 ] && [ -f /root/repo/scripts/ngram_compare.sh ]; then
  if bash /root/repo/scripts/ngram_compare.sh \
      > /root/repo/outputs/ngram_console.log 2>&1; then
    echo "[chain] ngram compare OK"
  else
    echo "[chain] ngram compare FAILED (see outputs/ngram_console.log)"
  fi
fi

# chinese-path smoke (~25 min incl. compile)
if [ "$(left)" -gt 2100 ]; then
  if bash /root/repo/scripts/hwdb_smoke.sh \
      > /root/repo/outputs/hwdb_console.log 2>&1; then
    echo "[chain] hwdb smoke OK"
  else
    echo "[chain] hwdb smoke FAILED (see outputs/hwdb_console.log)"
  fi
else
  echo "[chain] skipping hwdb smoke (deadline)"
fi

# dense-vs-deform matched-budget adaptation comparison (r2 VERDICT #4)
if [ "$(left)" -gt 2700 ]; then
  if bash /root/repo/scripts/deform_adapt.sh \
      > /root/repo/outputs/da_console.log 2>&1; then
    echo "[chain] deform-adapt comparison OK"
  else
    echo "[chain] deform-adapt comparison FAILED (see outputs/da_console.log)"
  fi
else
  echo "[chain] skipping deform-adapt (deadline)"
fi

# per-round Mosaic lowering re-probe for the deform gather (cheap)
if [ "$(left)" -gt 500 ]; then
  (cd /root/repo && timeout 400 python scripts/pallas_probe.py \
     > outputs/pallas_probe_r3.log 2>&1)
  echo "[chain] pallas probe: $(tail -1 /root/repo/outputs/pallas_probe_r3.log)"
fi

# flagship re-bench with the new MFU field (chip idle now)
if [ "$(left)" -gt 900 ]; then
  if (cd /root/repo && timeout 1500 python bench.py > outputs/bench_r3.json 2> outputs/bench_r3.err); then
    echo "[chain] bench: $(cat /root/repo/outputs/bench_r3.json)"
  else
    echo "[chain] bench FAILED (see outputs/bench_r3.err)"
  fi
fi
echo "[chain] all done at $(date)"
