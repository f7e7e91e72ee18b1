"""Device-side pixel preparation.

The f32 host path normalizes pixels on the host (C++ ``normalize_into``)
and transfers 12 bytes/pixel through the tunneled PJRT client. Sending
raw uint8 instead cuts host->device transfer 4x — which on this setup
also cuts the axon client's host-staging-buffer leak rate 4x (the leak
grows with bytes transferred; see CLAUDE.md) — and normalization becomes
a fused elementwise epilogue on device.

Semantics match the host path exactly: ImageNet normalization of
pixel/255, with everything outside ``valid_hw`` forced to 0.0 (the host
path pads the *normalized* buffer with zeros; reference
util/misc.py:375-397 NestedTensor pads the normalized tensor the same
way).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# torchvision ImageNet constants (reference datasets/transforms.py
# normalize call sites)
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def prep_images(images: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """Return ImageNet-normalized float32 images.

    uint8 input: normalize on device and zero the padded region.
    float input: already normalized+padded on the host — returned as-is.
    """
    if images.dtype != jnp.uint8:
        return images
    B, H, W, _ = images.shape
    mean = jnp.asarray(_MEAN, jnp.float32)
    std = jnp.asarray(_STD, jnp.float32)
    x = (images.astype(jnp.float32) / 255.0 - mean) / std
    rows = lax.broadcasted_iota(jnp.int32, (B, H, W, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (B, H, W, 1), 2)
    h = valid_hw[:, 0].reshape(B, 1, 1, 1)
    w = valid_hw[:, 1].reshape(B, 1, 1, 1)
    mask = (rows < h) & (cols < w)
    return jnp.where(mask, x, 0.0)
