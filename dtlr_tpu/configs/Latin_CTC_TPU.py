# CTC finetuning deltas (reference config/Latin_CTC.py) on top of the
# flagship TPU architecture (Latin_TPU.py: windowed encoder + dense
# decoder CA + shared deformable offsets) so finetuning consumes
# checkpoints pretrained with dtlr_tpu/configs/Latin_TPU.py.
_base_ = ["Latin_TPU.py"]

lr = 1e-5
max_iterations = 2500
lr_backbone = 1e-10
epochs = 700 * 4
lr_drop = 11
clip_max_norm = 0.01
CTC_loss_coef = 1.0
use_dn = False
mode_chr = True
eval_epoch = 10
