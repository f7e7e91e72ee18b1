# HWDB CTC-finetuning deltas (reference config/HWDB_full.py:1-120) on
# the TPU flagship Chinese architecture (Chinese_TPU.py: windowed
# encoder + dense decoder CA + GN backbone + the v3 CDN pretrain
# recipe), so finetuning consumes checkpoints pretrained with
# Chinese_TPU.py. Mirrors Latin_CTC_TPU.py's relationship to Latin_TPU.
_base_ = ["Chinese_TPU.py"]

# reference HWDB_full.py finetune optimizer: lr 1e-5 on everything,
# CDN off, clip 0.01, no EMA
lr = 1e-5
lr_backbone = 1e-5
epochs = 64 * 100
lr_drop = 22
clip_max_norm = 0.01
CTC_loss_coef = 1.0
use_dn = False
dn_number = 0
mode_chr = False
eval_epoch = 10
# keep EMA: the v3 trunk's EMA weights are the useful ones (nms_cer
# 0.0012 vs 0.0104 raw) and the finetune warm-starts from them
use_ema = True
