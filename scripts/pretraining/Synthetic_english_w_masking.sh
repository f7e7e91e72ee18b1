#!/bin/sh
# reference scripts/pretraining/Synthetic_english_w_masking.sh equivalent
python -m dtlr_tpu.train.pretrain -c dtlr_tpu/configs/Latin_w_erasing.py \
    --dataset_file synthetic_line_OCR_general \
    --output_dir outputs/pretrain_latin_masking "$@"
