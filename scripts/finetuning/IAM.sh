#!/bin/sh
python -m dtlr_tpu.train.finetune -c dtlr_tpu/configs/Latin_CTC.py \
    --dataset_file IAM --pretrain_dir outputs/pretrain_latin_masking \
    --output_dir outputs/iam --new_class_embedding --smart_mapping "$@"
