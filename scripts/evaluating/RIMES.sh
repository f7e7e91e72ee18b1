#!/bin/sh
python -m dtlr_tpu.eval.evaluate --dataset RIMES --mode test \
    --config dtlr_tpu/configs/Latin_CTC.py --ckpt_dir outputs/rimes \
    --NMS 0.5 --TH 0.3 "$@"
