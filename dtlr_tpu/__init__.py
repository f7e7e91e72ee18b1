"""DTLR-TPU: TPU-native detection-based text line recognition.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DTLR
("General Detection-based Text Line Recognition", NeurIPS 2024,
reference layout at /root/reference):

- character-detection DINO-DETR model (ResNet-50 backbone, 4-level
  multi-scale deformable attention, two-stage query selection,
  contrastive denoising, iterative box refinement)
- synthetic pretraining with the full DINO detection loss
- CTC finetuning via x-sorted queries + synthesized blank probability
- greedy / NMS decoding with CER/WER/AR-CR/SER-WA metrics
- n-gram rescoring hook

TPU-first design decisions (vs. the CUDA/torch reference):
- static shapes everywhere (bucketed images, padded targets, fixed
  CDN group layout) so every step is a single compiled XLA program
- NHWC conv layout, bf16 matmul paths with fp32 accumulation
- multi-scale deformable attention as an XLA gather formulation plus a
  Pallas kernel holding the flattened value tensor in VMEM
- on-device Hungarian matching (Jonker-Volgenant in lax.while_loop)
- data parallelism via jax.sharding.Mesh + jit, collectives inside the
  step function (replaces DDP/NCCL, reference util/misc.py:475-518)
"""

__version__ = "0.1.0"
