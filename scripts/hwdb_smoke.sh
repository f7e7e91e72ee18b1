#!/bin/bash
# Round-3 on-chip Chinese-path smoke (r2 VERDICT item 8): short HWDB
# synthetic pretrain with the 7356-class head (GNT composer,
# reference datasets/HWDB_Synth.py:36-223), then the chinese AR/CR
# metric mode end-to-end (reference evaluation.py:242-292,560-571).
# Proves the large-charset head memory layout on the real chip.
set -u
STEPS=${HWDB_STEPS:-300}
GNT_ROOT=/root/repo/outputs/hwdb_assets
SNAP=/tmp/hwdb_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
OUT=/root/repo/outputs/hwdb_smoke

# the sandbox has the HWDB charset pickle but no CASIA .gnt assets:
# build a procedural glyph bank in the exact GNT binary format
if [ ! -f "$GNT_ROOT/HWDB_gnt/fake000.gnt" ]; then
  mkdir -p "$GNT_ROOT/HWDB_gnt"
  python /root/repo/scripts/make_fake_gnt.py "$GNT_ROOT/HWDB_gnt" 600 3
fi

OPTS="batch_size=8 max_targets=64 'data_aug_scales=[96]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=160 \
  eval_set_size=64 transfer_uint8=True synthetic_reuse=4 \
  hwdb_charset_pickle=/root/reference/data/HWDB_v1/charset.pkl \
  'hwdb_glyphs_per_line=[5,25]' \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

status=0
eval python -m dtlr_tpu.train.pretrain \
  -c "$SNAP/dtlr_tpu/configs/Chinese.py" \
  --dataset_file HWDB_synth --data_root "$GNT_ROOT" \
  --output_dir "$OUT" \
  --steps_per_epoch "$STEPS" --epochs 1 --eval_every 1 --seed 0 \
  --options $OPTS \
  || status=$?
if [ "$status" -ne 0 ]; then echo "[hwdb] pretrain smoke FAILED ($status)"; exit $status; fi

# chinese AR/CR eval protocol over the trained smoke checkpoint
eval python -m dtlr_tpu.eval.evaluate \
  --dataset HWDB_synth --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" --data_root "$GNT_ROOT" \
  --metrics chinese --TH 0.3 --NMS 0.5 --max_images 64 --batch_size 8 \
  || { echo "[hwdb] chinese eval FAILED"; exit 1; }
echo "[hwdb] smoke OK"
