#!/bin/bash
# Round-2 flagship pipeline, stage 1: full-geometry Latin pretrain on
# the real TPU chip (VERDICT next-round item 1).
#
# Geometry: full Latin (6 enc + 6 dec, 900 queries, CDN on) with the
# flagship TPU architecture (windowed encoder + dense decoder CA).
# Data: full-canvas synthetic stream, <=5 words/line, 128px lines,
# fixed 200-line held-out eval set, greedy CER logged every epoch
# (1000 steps), EMA weights evaluated alongside.
#
# The package is snapshotted to /tmp/bigrun_src so concurrent repo work
# cannot perturb lazily-imported modules mid-run.
set -u
SNAP=/tmp/bigrun_src
rm -rf "$SNAP" && mkdir -p "$SNAP"
cp -r /root/repo/dtlr_tpu "$SNAP/"
cd "$SNAP"
# keep the axon PJRT plugin path (clobbering it hides the TPU backend)
export PYTHONPATH="$SNAP:${PYTHONPATH:-}"
EPOCHS=${BIGRUN_EPOCHS:-16}

# restart loop: the axon PJRT client leaks host staging buffers at the
# input-transfer rate (a 110-min run reached 130 GB RSS and was
# host-OOM killed). The trainer checkpoints per epoch and exits 3 when
# RSS crosses rss_restart_gb; auto-resume continues from the checkpoint.
while :; do
  python -m dtlr_tpu.train.pretrain \
    -c "$SNAP/dtlr_tpu/configs/Latin_TPU.py" \
    --dataset_file synthetic_line_OCR_general \
    --output_dir /root/repo/outputs/bigrun \
    --steps_per_epoch 1000 --eval_every 1 --seed 0 \
    --epochs "$EPOCHS" \
    --options batch_size=8 use_ema=True warmup_steps=1000 \
      max_targets=64 'data_aug_scales=[128]' data_aug_max_size=1024 \
      image_w_max=1024 image_h_max=192 synthetic_max_words=5 eval_set_size=200 \
      save_checkpoint_interval=5 lr_drop=40 rss_restart_gb=60
  code=$?
  [ "$code" -eq 0 ] && break       # reached target epochs
  [ "$code" -eq 3 ] || sleep 10    # 3 = planned RSS restart
  echo "[bigrun loop] restarting after exit $code"
done
