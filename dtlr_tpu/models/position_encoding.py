"""Sine positional embeddings (reference models/dino/position_encoding.py:62-108
PositionEmbeddingSineHW with separate H/W temperatures, normalize=True)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding_hw(
    pad_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """pad_mask: (B, H, W) True for PADDING pixels. Returns (B, H, W, 2*num_pos_feats).

    Matches reference semantics: cumsum over non-pad pixels, normalized by
    the last valid cumsum value, then interleaved sin/cos with per-axis
    temperatures (reference position_encoding.py:79-108, built with
    normalize=True at :138-153).
    """
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_tx = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_tx = temperature_w ** (2 * (dim_tx // 2) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_tx

    dim_ty = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_ty = temperature_h ** (2 * (dim_ty // 2) / num_pos_feats)
    pos_y = y_embed[:, :, :, None] / dim_ty

    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4)
    pos_x = pos_x.reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4)
    pos_y = pos_y.reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)


def gen_sineembed_for_position(pos: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Sine embedding of normalized box coords (reference
    models/dino/utils.py:141-167). pos: (..., 2|4) -> (..., dim*2|dim*4)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(dim, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / dim)

    def embed(coord):
        e = coord[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(e[..., 0::2]), jnp.cos(e[..., 1::2])], axis=-1).reshape(
            *coord.shape, dim
        )

    parts = [embed(pos[..., 1]), embed(pos[..., 0])]  # y then x, matching reference
    if pos.shape[-1] == 4:
        parts += [embed(pos[..., 2]), embed(pos[..., 3])]  # w, h
    return jnp.concatenate(parts, axis=-1)
