#!/bin/sh
python -m dtlr_tpu.train.finetune -c dtlr_tpu/configs/HWDB_full.py \
    --dataset_file HWDB --pretrain_dir outputs/pretrain_chinese \
    --output_dir outputs/hwdb "$@"
