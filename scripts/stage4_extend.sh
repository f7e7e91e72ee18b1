#!/bin/bash
# Round-3 surplus stage: extend the stage-3 CTC finetune (loss was still
# falling at its 6000-step budget) and re-run a focused TH x NMS sweep
# so stats.json reflects the extended model. Safe to re-run; resumes
# from outputs/finetune_r3.
#
# Usage: bash scripts/stage4_extend.sh [extra_steps] [sweep:full|focus]
set -u
EXTRA=${1:-6000}
SWEEP=${2:-focus}
SNAP=/tmp/stage4_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"

OUT=/root/repo/outputs/finetune_r3
COMMON_OPTS="batch_size=8 max_targets=64 'data_aug_scales=[128]' \
  data_aug_max_size=1024 image_w_max=1024 image_h_max=192 \
  synthetic_max_words=5 synthetic_charset=no_accent eval_epoch=1 \
  batch_norm_type=group \
  compilation_cache_dir=/root/repo/outputs/xla_cache"

# continuation: same full-model stage-2 optimizer, one more "epoch" of
# EXTRA steps (epochs must exceed the restored epoch counter)
if ! eval python -m dtlr_tpu.train.finetune \
  -c "$SNAP/dtlr_tpu/configs/Latin_CTC_TPU.py" \
  --dataset_file synthetic --output_dir "$OUT" \
  --resume_finetuning --epochs 3 --seed 5 \
  --options max_iterations=$EXTRA $COMMON_OPTS; then
  echo "[stage4] extension finetune FAILED"; exit 1
fi
echo "[stage4] extension done"

if [ "$SWEEP" = full ]; then
  SWEEP_ARGS="--sweep"
else
  # focused re-sweep: read the TH picked by the stage-3 full sweep and
  # scan NMS at TH±0.05 (9 NMS x 3 TH = 27 points, ~1/3 the full grid)
  TH=$(python - <<'EOF'
import json
try:
    rec = json.load(open("/root/repo/outputs/finetune_r3/stats_dect/synthetic/stats.json"))
    print(rec.get("TH", 0.3))
except Exception:
    print(0.3)
EOF
)
  SWEEP_ARGS="--sweep --sweep_th $TH"
fi

if ! eval python -m dtlr_tpu.eval.evaluate \
  --dataset synthetic --mode val --config "$OUT/config_cfg.py" \
  --ckpt_dir "$OUT" $SWEEP_ARGS --max_images 200 --batch_size 8 \
  --options $COMMON_OPTS; then
  echo "[stage4] re-sweep FAILED"; exit 1
fi
echo "[stage4] re-sweep done"
