#!/bin/bash
# Round-4 tail: phases B-F after the phase-A corpus-mixed pretrain chain
# (scripts/round4_chain.sh) releases the chip. Headline-first order, all
# chip stages bounded (round-3 lesson), durable state committed after
# every phase (round-3 VERDICT weak #1).
#   B. two-stage corpus-mixed CTC finetune -> natural-text TH x NMS
#      sweep -> random-char continuity eval -> n-gram rescore arms
#      (LM-only, lexicon+LM)           [VERDICT next #1, #5]
#   C. HWDB multi-k pretrain -> chinese AR/CR eval [VERDICT next #4]
#   D. cipher-mode end-to-end drive (SER/WA)       [VERDICT next #7]
#   E. multi-scale / long-line protocol leg        [VERDICT next #8]
#   F. bench.py on the freed chip (fused-head MFU + roofline fields)
# Run AFTER round4_chain.sh exits (it banks artifacts/r4run_params*).
set -u
HARD_END=${R4_HARD_END:-$(date -d '18:00' +%s)}
left() { echo $(( HARD_END - $(date +%s) )); }
log() { echo "[r4tail $(date -u +%H:%M:%S)] $*"; }
cd /root/repo

bank_commit() { # bank_commit <msg> <paths...>
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: training-artifact/evidence bank, no source change" \
    && log "committed: $msg" || log "nothing to commit for: $msg"
}

# ---- B. corpus-mixed finetune + sweeps + rescore -----------------------
PRE=${R4_PRE:-/root/repo/outputs/r4run}
OUT=/root/repo/outputs/finetune_r4
S1=${R4_FT1:-1500}
S2=${R4_FT2:-6000}
SNAP=/tmp/r4tail_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
# APPEND to PYTHONPATH: this sandbox registers the TPU backend via a
# sitecustomize dir on the default PYTHONPATH (JAX_PLATFORMS=axon is set
# globally); replacing the path makes every jax import die with
# "Backend 'axon' is not in the list of known backends".
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

if [ "$(left)" -gt 4800 ]; then
  log "B1: heads-only finetune ($S1 steps)"
  eval timeout 2400 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --pretrain_dir "$PRE" \
    --output_dir "$OUT" --new_class_embedding --smart_mapping \
    --epochs 1 --seed 3 \
    --options max_iterations=$S1 $COMMON_OPTS \
    || log "B1 FAILED (continuing: B2 can resume whatever exists)"
  log "B2: full-model finetune ($S2 steps)"
  eval timeout 4200 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --output_dir "$OUT" \
    --resume_finetuning --epochs 2 --seed 4 \
    --options max_iterations=$S2 $COMMON_OPTS \
    || log "B2 FAILED"
  bank_commit "Bank round-4 corpus-mixed finetune checkpoints+logs" \
    outputs/finetune_r4/log.txt outputs/finetune_r4/info.txt \
    outputs/finetune_r4/config_cfg.py 2>/dev/null
else
  log "skip B finetune (deadline)"
fi

if [ "$(left)" -gt 2400 ] && [ -d "$OUT" ]; then
  log "B3: natural-text TH x NMS sweep"
  eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
    --ckpt_dir "$OUT" --sweep --max_images 200 --batch_size 8 \
    --options $COMMON_OPTS synthetic_corpus_prob=1.0 \
    || log "B3 sweep FAILED"
  cp "$OUT/stats_dect/synthetic/stats.json" \
     /root/repo/docs/evidence/r4_stats_naturaltext.json 2>/dev/null
  log "B3 stats: $(tr -d '\n ' < $OUT/stats_dect/synthetic/stats.json 2>/dev/null)"
fi

if [ "$(left)" -gt 1500 ] && [ -f "$OUT/stats_dect/synthetic/stats.json" ]; then
  TH=$(env PYTHONPATH= python -c "import json;print(json.load(open('$OUT/stats_dect/synthetic/stats.json')).get('TH',0.3))" 2>/dev/null || echo 0.3)
  NMS=$(env PYTHONPATH= python -c "import json;print(json.load(open('$OUT/stats_dect/synthetic/stats.json')).get('NMS',0.5))" 2>/dev/null || echo 0.5)
  log "B4: random-char continuity eval at TH=$TH NMS=$NMS"
  eval timeout 1500 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
    --ckpt_dir "$OUT" --TH "$TH" --NMS "$NMS" --max_images 200 --batch_size 8 \
    --options $COMMON_OPTS synthetic_corpus_prob=0.0 \
    > /root/repo/outputs/r4_randomchar_eval.log 2>&1 \
    && log "B4: $(tail -2 /root/repo/outputs/r4_randomchar_eval.log | head -1)" \
    || log "B4 FAILED"
fi

if [ "$(left)" -gt 2100 ] && [ -d "$OUT" ]; then
  log "B5: n-gram rescore, LM-only arm"
  timeout 2100 python -m dtlr_tpu.ngram.rescore \
    --config_path "$SNAP/dtlr_tpu/ngram/synthetic_r4_words.yaml" \
    > /root/repo/outputs/r4_ngram_words.log 2>&1 \
    && log "B5: $(tail -1 /root/repo/outputs/r4_ngram_words.log)" \
    || log "B5 FAILED"
fi
if [ "$(left)" -gt 1800 ] && [ -d "$OUT" ]; then
  log "B6: n-gram rescore, lexicon+LM arm"
  timeout 1800 python -m dtlr_tpu.ngram.rescore \
    --config_path "$SNAP/dtlr_tpu/ngram/synthetic_r4_words_lex.yaml" \
    > /root/repo/outputs/r4_ngram_words_lex.log 2>&1 \
    && log "B6: $(tail -1 /root/repo/outputs/r4_ngram_words_lex.log)" \
    || log "B6 FAILED"
fi
bank_commit "Round-4 phase B evidence: natural-text sweep + rescore arms" \
  docs/evidence/r4_stats_naturaltext.json outputs/r4_randomchar_eval.log \
  outputs/r4_ngram_words.log outputs/r4_ngram_words_lex.log

# ---- C. HWDB multi-k pretrain + chinese eval ---------------------------
if [ "$(left)" -gt 3000 ]; then
  log "C: HWDB real pretrain"
  HNPZ=/root/repo/artifacts/r4run_params_ema.npz
  [ -f "$HNPZ" ] || HNPZ=/root/repo/artifacts/r3run_params_ema.npz
  HWDB_STEPS=${R4_HWDB_STEPS:-1500} HWDB_EPOCHS=${R4_HWDB_EPOCHS:-4} \
  HWDB_NPZ="$HNPZ" \
    timeout $(( $(left) - 1800 > 7200 ? 7200 : $(left) - 1800 )) \
    bash /root/repo/scripts/hwdb_real.sh \
    > /root/repo/outputs/r4_hwdb_console.log 2>&1 \
    && log "C done: $(tail -3 /root/repo/outputs/r4_hwdb_console.log | head -2 | tr '\n' ' ')" \
    || log "C FAILED/timeout: $(tail -2 /root/repo/outputs/r4_hwdb_console.log | tr '\n' ' ')"
  bank_commit "Round-4 HWDB multi-k pretrain + chinese AR/CR evidence" \
    outputs/r4_hwdb_console.log outputs/hwdb_real/log.txt \
    outputs/hwdb_real/stats_dect 2>/dev/null
else
  log "skip C (deadline)"
fi

# ---- D. cipher-mode end-to-end drive -----------------------------------
if [ "$(left)" -gt 1500 ] && [ -d "$OUT" ]; then
  log "D: cipher-mode eval (SER/WA) on the finetuned model"
  eval timeout 1200 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
    --ckpt_dir "$OUT" --metrics cipher --TH 0.3 --NMS 0.5 \
    --max_images 100 --batch_size 8 \
    --options $COMMON_OPTS synthetic_corpus_prob=1.0 \
    > /root/repo/outputs/r4_cipher_eval.log 2>&1 \
    && log "D: $(tail -2 /root/repo/outputs/r4_cipher_eval.log | tr '\n' ' ')" \
    || log "D FAILED"
  bank_commit "Round-4 cipher-mode end-to-end drive (SER/WA)" \
    outputs/r4_cipher_eval.log
fi

# ---- E. multi-scale / long-line protocol leg ---------------------------
if [ "$(left)" -gt 2100 ] && [ -d "$OUT" ]; then
  log "E: big-geometry eval (min-side 480, <=1333, up to 30 words)"
  eval timeout 1800 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
    --ckpt_dir "$OUT" --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 4 \
    --options batch_size=4 max_targets=256 "'data_aug_scales=[480]'" \
      data_aug_max_size=1333 image_w_max=1344 image_h_max=512 \
      synthetic_max_words=30 synthetic_charset=no_accent_space \
      batch_norm_type=group dense_box_bias=True \
      synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
      synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
      synthetic_corpus_prob=1.0 \
      compilation_cache_dir=/root/repo/outputs/xla_cache \
    > /root/repo/outputs/r4_bigscale_eval.log 2>&1 \
    && log "E: $(tail -2 /root/repo/outputs/r4_bigscale_eval.log | tr '\n' ' ')" \
    || log "E FAILED/timeout (documenting)"
  bank_commit "Round-4 multi-scale/long-line protocol leg" \
    outputs/r4_bigscale_eval.log
fi

# ---- F. bench on the freed chip ----------------------------------------
if [ "$(left)" -gt 900 ]; then
  log "F: bench.py (fused heads + roofline)"
  (cd /root/repo && timeout $(( $(left) - 120 )) python bench.py \
    > outputs/r4_bench.log 2>&1) \
    && log "F: $(tail -1 /root/repo/outputs/r4_bench.log)" \
    || log "F FAILED/timeout"
  bank_commit "Round-4 bench: fused shared heads + roofline attribution" \
    outputs/r4_bench.log
fi
log "tail done ($(left)s to spare)"
