#!/bin/bash
# Round-3 extension: first real (multi-k-step) HWDB-synthetic pretrain,
# warm-started from the Latin GN trunk (artifacts/r3run_params.npz via
# the tolerant merge: backbone/encoder/decoder transfer, the 7356-class
# head and label_enc re-init at their HWDB shapes). Goal: a non-zero
# AR/CR through the `chinese` metric mode — the 300-step smoke
# (hwdb_smoke.sh) proved the path but could not cross any confidence
# threshold. Reference protocol: datasets/HWDB_Synth.py:36-223,
# evaluation.py:242-292,560-571.
set -u
STEPS=${HWDB_STEPS:-2000}
EPOCHS=${HWDB_EPOCHS:-5}
NPZ=${HWDB_NPZ:-/root/repo/artifacts/r4run_params_ema.npz}
GNT_ROOT=/root/repo/outputs/hwdb_assets
SNAP=/tmp/hwdbr_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
OUT=${HWDB_OUT:-/root/repo/outputs/hwdb_real}

# v2 bank: class-consistent skeleton+jitter glyphs (see make_fake_gnt.py
# header; the v1 fully-random-doodle bank was unlearnable by design —
# hwdb_diag evidence in docs/ROUND4_NOTES.md phase C)
if [ ! -f "$GNT_ROOT/HWDB_gnt/bank_v2.stamp" ]; then
  rm -rf "$GNT_ROOT/HWDB_gnt" && mkdir -p "$GNT_ROOT/HWDB_gnt"
  python /root/repo/scripts/make_fake_gnt.py "$GNT_ROOT/HWDB_gnt" 600 8 \
    && touch "$GNT_ROOT/HWDB_gnt/bank_v2.stamp" \
    || { echo "[hwdb_real] glyph bank generation FAILED"; exit 1; }
fi

# batch 4, not 8: the 7356-class focal loss materializes the stacked
# (6, B, 900, 7356) fp32 logits + temporaries; B=8 blew HBM (39.35G vs
# 15.75G) even before the encoder fix (see Chinese_TPU.py header).
OPTS="batch_size=4 max_targets=64 'data_aug_scales=[96]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=160 \
  eval_set_size=64 \
  warmup_steps=500 lr_drop=1000000 \
  hwdb_charset_pickle=/root/reference/data/HWDB_v1/charset.pkl \
  'hwdb_glyphs_per_line=[5,25]' \
  compilation_cache_dir=/root/repo/outputs/xla_cache \
  ${HWDB_EXTRA_OPTS:-}"

status=0
eval timeout "${HWDB_TIMEOUT:-6000}" python -m dtlr_tpu.train.pretrain \
  -c "$SNAP/dtlr_tpu/configs/Chinese_TPU.py" \
  --dataset_file HWDB_synth --data_root "$GNT_ROOT" \
  --output_dir "$OUT" --warm_start_npz "$NPZ" \
  --steps_per_epoch "$STEPS" --epochs "$EPOCHS" --eval_every "${HWDB_EVAL_EVERY:-1}" --seed 0 \
  --options $OPTS \
  || status=$?
if [ "$status" -ne 0 ]; then echo "[hwdb_real] pretrain FAILED ($status)"; exit $status; fi

eval timeout 1800 python -m dtlr_tpu.eval.evaluate \
  --dataset HWDB_synth --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" --data_root "$GNT_ROOT" \
  --metrics chinese --TH "${HWDB_EVAL_TH:-0.2}" --NMS 0.5 --max_images 64 --batch_size 8 \
  || { echo "[hwdb_real] chinese eval FAILED"; exit 1; }
echo "[hwdb_real] done"
