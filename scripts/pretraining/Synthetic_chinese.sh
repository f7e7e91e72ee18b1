#!/bin/sh
python -m dtlr_tpu.train.pretrain -c dtlr_tpu/configs/Chinese.py \
    --dataset_file HWDB_synth --output_dir outputs/pretrain_chinese "$@"
