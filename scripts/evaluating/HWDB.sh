#!/bin/sh
python -m dtlr_tpu.eval.evaluate --dataset HWDB --mode test \
    --config dtlr_tpu/configs/HWDB_full.py --ckpt_dir outputs/hwdb \
    --metrics chinese "$@"
