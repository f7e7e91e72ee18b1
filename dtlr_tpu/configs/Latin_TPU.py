# TPU-optimized Latin pretraining: identical to Latin.py except the
# deformable sampling locations are shared across heads
# (deform_shared_offsets), cutting the row-rate-bound TPU gathers 8x
# in every encoder/decoder deformable attention. Train-from-scratch
# option; per-head weights over the shared sampled points are kept.
_base_ = ["Latin.py"]

deform_shared_offsets = True

# dense windowed encoder (zero-gather, MXU-native) — see
# models/windowed_encoder.py. Comment out to keep the deformable
# encoder with shared sampling.
encoder_type = "windowed"
encoder_win = 32
