#!/bin/sh
# reference scripts/evaluating/IAM.sh: --NMS 0.5 --TH 0.3
python -m dtlr_tpu.eval.evaluate --dataset IAM --mode test \
    --config dtlr_tpu/configs/Latin_CTC.py --ckpt_dir outputs/iam \
    --NMS 0.5 --TH 0.3 "$@"
