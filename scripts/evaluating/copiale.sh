#!/bin/sh
python -m dtlr_tpu.eval.evaluate --dataset copiale --mode test \
    --config dtlr_tpu/configs/Latin_CTC.py --ckpt_dir outputs/copiale \
    --metrics cipher "$@"
