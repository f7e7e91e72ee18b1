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
encoder_type = "windowed"
encoder_win = 32
decoder_ca = "dense"
# Gaussian box-locality log-prior on the dense decoder CA — the Latin
# trunk this config warm-starts from co-adapted with it (round-4 phase A).
dense_box_bias = True
transfer_uint8 = True
synthetic_reuse = 4
compilation_cache_dir = "/root/repo/outputs/xla_cache"
