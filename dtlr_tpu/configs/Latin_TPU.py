# TPU-optimized Latin pretraining: identical to Latin.py except the
# deformable sampling locations are shared across heads
# (deform_shared_offsets), cutting the row-rate-bound TPU gathers 8x
# in every encoder/decoder deformable attention. Train-from-scratch
# option; per-head weights over the shared sampled points are kept.
_base_ = ["Latin.py"]

deform_shared_offsets = True

# From-scratch backbone recipe (round-3 ablation winner, see
# docs/ROUND3_NOTES.md): GroupNorm + full backbone LR. The reference's
# FrozenBN + lr_backbone=1e-5 assumes ImageNet-pretrained weights AND
# statistics (reference models/dino/backbone.py:118-120); training a
# random-init backbone through identity-stats FrozenBN at 1e-5 produced
# the round-2 flat confidence ceiling (mean max-conf 0.157->0.138 over
# 5k->16k steps). Restore batch_norm_type="FrozenBatchNorm2d" +
# lr_backbone=1e-5 when importing pretrained torch weights.
batch_norm_type = "group"
lr_backbone = 1e-4

# dense windowed encoder (zero-gather, MXU-native) — see
# models/windowed_encoder.py. Comment out to keep the deformable
# encoder with shared sampling.
encoder_type = "windowed"
encoder_win = 32

# dense decoder cross-attention (DETR-style Q x S attention, keys carry
# the level+sine PE). Exact deformable sampling is gather row-rate-bound
# on TPU (~3.2 ms/layer floor at B=8, S=3570) while full dense attention
# costs the same on the MXU; end to end this is 36 ms vs 82 ms for the
# B=8 flagship forward (222 vs 97 lines/s/chip). Set to "deform" for the
# reference-faithful decoder.
decoder_ca = "dense"

# box-guided locality prior on the dense decoder CA (Gaussian log-bias
# in box-normalized distance, per-head learnable sharpness): deform
# attention's locality inductive bias without its gathers. Trained into
# every round-4/5 checkpoint; committed here so the flagship recipe is
# reproducible from the configs alone (round-5 trunk memo,
# docs/ROUND5_NOTES.md).
dense_box_bias = True

# ship raw uint8 pixels to the device and normalize there (ops/pixels.py):
# 4x smaller tunnel transfers, 4x slower axon host-buffer leak; semantics
# identical to the host-normalized f32 path.
transfer_uint8 = True

# synthetic-sample reuse economy: the reference renders 5000 lines per
# epoch and sweeps them ~10x per epoch (reference main_synthetic.py:383);
# reuse=4 reproduces that on the 1-core host (fresh augmentation per use).
synthetic_reuse = 4

# persistent XLA compilation cache (restarts re-jit from disk instead of
# paying the 5-10 min tunnel compile again)
compilation_cache_dir = "/root/repo/outputs/xla_cache"
