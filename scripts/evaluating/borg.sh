#!/bin/sh
python -m dtlr_tpu.eval.evaluate --dataset borg --mode test \
    --config dtlr_tpu/configs/Latin_CTC.py --ckpt_dir outputs/borg \
    --metrics cipher "$@"
