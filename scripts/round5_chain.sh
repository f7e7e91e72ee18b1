#!/bin/bash
# Round-5 chip queue, serial on the single TPU (CLAUDE.md one-process
# rule). Phases, each banked+committed the moment it lands:
#   A. Chinese CTC finetune (HWDB_full_TPU.py) from the banked v3 trunk
#      EMA npz — calibrates the greedy blank-synthesis decode at 7356
#      classes (VERDICT missing #5); chinese-mode greedy + NMS evals on
#      a FRESH GNT seed, raw and EMA.
#   B. Phase E' big-geometry adaptation (VERDICT missing #2): 1000-step
#      finetune of the r4b checkpoint at min-side 480 / <=1333 /
#      30-word lines, then the adapted eval — the leg
#      round4_session2.sh:101-131 scripted but never ran.
#   C. Natural-text headline hygiene (VERDICT weak #5): fixed reference
#      operating point TH 0.3/NMS 0.5 (scripts/evaluating/IAM.sh), and
#      the swept winner TH 0.1/NMS 0.4 re-scored on a fresh eval seed.
# A trap banks any live training dir on EXIT/TERM so a round-boundary
# kill can never again strand a trunk in gitignored outputs/
# (VERDICT next #3; the round-4 timeout-124 path skipped the bank).
set -u
cd /root/repo
log() { echo "[r5chain $(date -u +%H:%M:%S)] $*"; }

bank_commit() { # bank_commit <msg> <paths...>
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: training-artifact/evidence bank, no source change" \
    && log "committed: $msg" || log "nothing to commit for: $msg"
}

# ---- bank-on-exit hook ----------------------------------------------------
LIVE_RUN=""   # set to the active training dir before each long stage
on_exit() {
  status=$?
  if [ -n "$LIVE_RUN" ] && [ -d "$LIVE_RUN/checkpoint" ]; then
    log "EXIT($status) with live run $LIVE_RUN — banking"
    name=$(basename "$LIVE_RUN")
    env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
      "$LIVE_RUN" "artifacts/${name}_emerg" --ema 2>/dev/null \
      && bank_commit "Emergency bank of interrupted run $name" \
        "artifacts/${name}_emerg.npz" "artifacts/${name}_emerg_ema.npz" \
        "$LIVE_RUN/log.txt" \
      || log "emergency bank failed"
  fi
}
trap on_exit EXIT

SNAP=/tmp/r5_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

GNT_ROOT=/root/repo/outputs/hwdb_assets
FT=/root/repo/outputs/hwdb_ft
HWDB_OPTS="batch_size=4 max_targets=64 'data_aug_scales=[96]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=160 \
  eval_set_size=64 eval_epoch=1 \
  hwdb_charset_pickle=/root/reference/data/HWDB_v1/charset.pkl \
  'hwdb_glyphs_per_line=[5,25]' \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

# ---- A. Chinese CTC finetune ---------------------------------------------
if [ ! -f "$FT/.done" ]; then
  log "A1: heads-only CTC finetune (2000 steps) from hwdb_v3_20k_ema.npz"
  LIVE_RUN=$FT
  eval timeout 4200 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/HWDB_full_TPU.py" \
    --dataset_file HWDB_synth --data_root "$GNT_ROOT" \
    --pretrain_dir /root/repo/artifacts/hwdb_v3_20k_ema.npz \
    --output_dir "$FT" --epochs 1 --seed 11 \
    --options max_iterations=2000 $HWDB_OPTS \
    || log "A1 FAILED (continuing: A2 resumes whatever exists)"
  log "A2: full-model CTC finetune (6000 steps)"
  eval timeout 6000 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/HWDB_full_TPU.py" \
    --dataset_file HWDB_synth --data_root "$GNT_ROOT" \
    --output_dir "$FT" --resume_finetuning --epochs 4 --seed 12 \
    --options max_iterations=2000 $HWDB_OPTS \
    || log "A2 FAILED"
  LIVE_RUN=""
  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/snapshot_params.py \
    "$FT" artifacts/hwdb_ft_params --ema 2>/dev/null \
    && log "banked hwdb finetune npz" || log "hwdb ft snapshot failed"
  touch "$FT/.done"
  bank_commit "Bank Chinese CTC finetune (HWDB_full_TPU, 2000 head + 6000 full)" \
    outputs/hwdb_ft/log.txt outputs/hwdb_ft/info.txt \
    outputs/hwdb_ft/config_cfg.py \
    artifacts/hwdb_ft_params.npz artifacts/hwdb_ft_params_ema.npz
fi

# A3: chinese-mode evals on a FRESH GNT seed: greedy (the number the
# finetune exists to fix) and the NMS operating point, raw + EMA.
for arm in "greedy_ema --NMS -1 --TH -1 --ema" "greedy_raw --NMS -1 --TH -1" \
           "nms_ema --NMS 0.5 --TH 0.2 --ema"; do
  name=${arm%% *}; flags=${arm#* }
  log "A3: chinese eval $name"
  eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
    --dataset HWDB_synth --mode val --config "$FT/config_cfg.py" \
    --ckpt_dir "$FT" --data_root "$GNT_ROOT" \
    --metrics chinese --eval_seed 777 --max_images 128 --batch_size 8 \
    $flags > "/root/repo/outputs/r5_hwdb_ft_${name}.log" 2>&1 \
    && log "A3 $name: $(tail -1 /root/repo/outputs/r5_hwdb_ft_${name}.log)" \
    || log "A3 $name FAILED: $(tail -3 /root/repo/outputs/r5_hwdb_ft_${name}.log | head -1)"
done
bank_commit "Chinese post-finetune evals: greedy calibration + NMS, fresh seed" \
  outputs/r5_hwdb_ft_greedy_ema.log outputs/r5_hwdb_ft_greedy_raw.log \
  outputs/r5_hwdb_ft_nms_ema.log

# ---- B. phase E' big-geometry adaptation ----------------------------------
OUT=/root/repo/outputs/finetune_r4b
BIG=/root/repo/outputs/r5_bigscale
BIG_OPTS="batch_size=4 max_targets=256 'data_aug_scales=[480]' \
  data_aug_max_size=1333 image_w_max=1344 image_h_max=512 \
  synthetic_max_words=30 synthetic_charset=no_accent_space eval_epoch=1 \
  batch_norm_type=group dense_box_bias=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  synthetic_corpus_prob=0.5 eval_set_size=32 \
  compilation_cache_dir=/root/repo/outputs/xla_cache"
if [ -d "$OUT/checkpoint" ] && [ ! -f "$BIG/.done" ]; then
  log "B: big-geometry adaptation finetune (1000 steps from r4b ckpt)"
  rm -rf "$BIG" && mkdir -p "$BIG"
  cp -r "$OUT/checkpoint" "$BIG/checkpoint"
  LIVE_RUN=$BIG
  eval timeout 5400 python -m dtlr_tpu.train.finetune \
    -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
    --dataset_file synthetic --output_dir "$BIG" \
    --resume_finetuning --epochs 3 --seed 5 \
    --options max_iterations=1000 $BIG_OPTS \
    || log "B adapt FAILED"
  LIVE_RUN=""
  touch "$BIG/.done"
  log "B: adapted big-geometry eval"
  eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$BIG/config_cfg.py" \
    --ckpt_dir "$BIG" --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 4 \
    --options $BIG_OPTS synthetic_corpus_prob=1.0 \
    > /root/repo/outputs/r5_bigscale_adapted_eval.log 2>&1 \
    && log "B eval: $(tail -1 /root/repo/outputs/r5_bigscale_adapted_eval.log)" \
    || log "B eval FAILED"
  bank_commit "Phase E': big-geometry adaptation leg (1000-step adapt + eval)" \
    outputs/r5_bigscale_adapted_eval.log outputs/r5_bigscale/log.txt \
    outputs/r5_bigscale/info.txt outputs/r5_bigscale/config_cfg.py
fi

# ---- C. natural-text headline hygiene ------------------------------------
FT4=/root/repo/outputs/finetune_r4b
NT_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent_space \
  batch_norm_type=group dense_box_bias=True \
  synthetic_corpus_file=/root/repo/artifacts/corpus_words_train.txt \
  synthetic_corpus_val_file=/root/repo/artifacts/corpus_words_val.txt \
  compilation_cache_dir=/root/repo/outputs/xla_cache"
for arm in "fixed_op --TH 0.3 --NMS 0.5 --eval_seed 0" \
           "winner_fresh --TH 0.1 --NMS 0.4 --eval_seed 1000" \
           "fixed_op_fresh --TH 0.3 --NMS 0.5 --eval_seed 1000"; do
  name=${arm%% *}; flags=${arm#* }
  log "C: natural-text eval $name"
  eval timeout 2400 python -m dtlr_tpu.eval.evaluate \
    --dataset synthetic --mode val --config "$FT4/config_cfg.py" \
    --ckpt_dir "$FT4" --max_images 200 --batch_size 8 \
    --options $NT_OPTS synthetic_corpus_prob=1.0 \
    $flags > "/root/repo/outputs/r5_nt_${name}.log" 2>&1 \
    && log "C $name: $(tail -1 /root/repo/outputs/r5_nt_${name}.log)" \
    || log "C $name FAILED: $(tail -3 /root/repo/outputs/r5_nt_${name}.log | head -1)"
done
bank_commit "Natural-text headline at the reference fixed operating point + fresh-seed re-score" \
  outputs/r5_nt_fixed_op.log outputs/r5_nt_winner_fresh.log \
  outputs/r5_nt_fixed_op_fresh.log

log "round5 chain done"
