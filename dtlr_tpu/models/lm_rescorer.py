"""Self-attention LM rescorer over detected character features.

Covers reference models/LM_model.py:8-130 (SelfAttentionModel): a
4-layer transformer encoder over per-character feature vectors with a
sinusoidal positional encoding derived from the box x-centers, scoring
character classes — an auxiliary rescoring model (not used by the main
train/eval paths in the reference either).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def box_x_positional_encoding(x_centers: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """(B, N) x-centers in [0,1] -> (B, N, d_model) sine PE (reference
    LM_model.py:8-27 positional_encoding over scaled x positions)."""
    pos = x_centers[..., None] * 100.0
    dim = jnp.arange(d_model // 2, dtype=jnp.float32)
    div = jnp.exp(-math.log(10000.0) * 2 * dim / d_model)
    ang = pos * div
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class SelfAttentionRescorer(nn.Module):
    num_classes: int
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 4
    d_ffn: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, x_centers: jnp.ndarray,
                 pad_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """features (B, N, C), x_centers (B, N) -> logits (B, N, K)."""
        h = nn.Dense(self.d_model, dtype=self.dtype, name="input_proj")(features)
        h = h + box_x_positional_encoding(x_centers, self.d_model).astype(h.dtype)
        attn_mask = None
        if pad_mask is not None:
            attn_mask = pad_mask[:, None, :]  # (B, 1, N) True = blocked
        for i in range(self.n_layers):
            q = nn.LayerNorm(dtype=jnp.float32, name=f"norm1_{i}")(h)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, dtype=self.dtype, name=f"attn_{i}"
            )(q, q, mask=None if attn_mask is None else ~attn_mask[:, :, None, :])
            h = h + a
            f = nn.LayerNorm(dtype=jnp.float32, name=f"norm2_{i}")(h)
            f = nn.Dense(self.d_ffn, dtype=self.dtype, name=f"ffn1_{i}")(f)
            f = nn.relu(f)
            f = nn.Dense(self.d_model, dtype=self.dtype, name=f"ffn2_{i}")(f)
            h = h + f
        h = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(h)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(h)
