# TPU-flagship Chinese (CASIA HWDB) pretraining: Chinese.py class
# geometry (reference config/Chinese.py) on the Latin_TPU flagship
# architecture (windowed dense encoder + dense decoder cross-attention,
# GroupNorm from-scratch backbone recipe). Warm-starting the HWDB head
# from the Latin flagship trunk requires the SAME architecture — the
# round-4 first attempt inherited Latin.py's deformable encoder and the
# tolerant npz merge silently dropped every windowed-encoder param
# (119 unused), on top of a 39 GB HBM OOM from fp32 gather
# intermediates at the 7356-class geometry.
_base_ = ["Chinese.py"]

deform_shared_offsets = True
batch_norm_type = "group"
lr_backbone = 1e-4

# v3 optimizer/denoising recipe — the ONLY recipe that trains the
# 7356-class head. Chinese.py inherits use_dn=False dn_number=0 lr=1e-3
# clip_max_norm=0.01; two multi-k runs (v1 36k, v2 28k steps) proved
# that combination dead at this class count (docs/ROUND4_NOTES.md
# phases C-D), and the v3 relaunch with the Latin-proven CDN recipe
# reached EMA nms_cer 0.0012 by 20k steps (docs/evidence/hwdb_v3/).
# Previously these lived only in a transient HWDB_EXTRA_OPTS env var
# (round-4 advisor finding) — committed here so the script is safe to
# rerun as-is.
use_dn = True
dn_number = 100
dn_label_noise_ratio = 0.5
dn_box_noise_scale = 0.4
lr = 1e-4
clip_max_norm = 0.1
use_ema = True
ema_decay = 0.9997
encoder_type = "windowed"
encoder_win = 32
decoder_ca = "dense"
# Gaussian box-locality log-prior on the dense decoder CA — the Latin
# trunk this config warm-starts from co-adapted with it (round-4 phase A).
dense_box_bias = True
transfer_uint8 = True
synthetic_reuse = 4
compilation_cache_dir = "/root/repo/outputs/xla_cache"
