"""Core model layers: MLP head, multi-scale deformable attention module.

The deformable-attention *module* (projections + softmax + location
computation) mirrors reference models/dino/ops/modules/ms_deform_attn.py:30-126
including its initialization scheme (:62-76); the sampling core is the
TPU-native op in ops/deform_attn.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_attn import deform_attn_xla, deform_attn_xla_shared


class MLP(nn.Module):
    """ReLU MLP (reference models/dino/utils.py:110-122)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional ring init for sampling offsets (reference
    ms_deform_attn.py:63-70): head h points at angle 2*pi*h/n_heads, point
    p scaled by (p+1), normalized to the unit Linf ball."""

    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    scales = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    grid = grid * scales

    def init(key, shape, dtype=jnp.float32):
        del key
        flat = grid.reshape(-1).astype(dtype)
        assert flat.shape == shape, (flat.shape, shape)
        return flat

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention.

    Call signature mirrors the reference module: query (B, Lq, C),
    reference_points (B, Lq, L, 2|4) in [0,1], flattened input
    (B, S, C) with *static* per-level spatial shapes, and a padding
    mask (B, S) True at padding.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    shared_offsets: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        reference_points: jnp.ndarray,
        input_flatten: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
        input_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M
        MM = 1 if self.shared_offsets else M  # offset groups

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)

        offsets = nn.Dense(
            MM * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(MM, L, P),
            dtype=jnp.float32,
            name="sampling_offsets",
        )(query.astype(jnp.float32))
        offsets = offsets.reshape(B, Lq, MM, L, P, 2)

        attn = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="attention_weights",
        )(query.astype(jnp.float32))
        attn = jax.nn.softmax(attn.reshape(B, Lq, M, L * P), axis=-1)
        attn = attn.reshape(B, Lq, M, L, P)

        ref = reference_points.astype(jnp.float32)
        if ref.shape[-1] == 2:
            # normalize offsets by level (W, H) (reference :102-105)
            normalizer = jnp.asarray(
                [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
            )  # (L, 2) in (x, y) order
            loc = ref[:, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]
        elif ref.shape[-1] == 4:
            # box-relative offsets (reference :106-108)
            loc = (
                ref[:, :, None, :, None, :2]
                + offsets / P * ref[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError(f"reference_points last dim must be 2 or 4, got {ref.shape[-1]}")

        if self.shared_offsets:
            out = deform_attn_xla_shared(
                value, spatial_shapes, loc[:, :, 0], attn, n_heads=M
            )
        else:
            out = deform_attn_xla(value.reshape(B, S, M, D), spatial_shapes, loc, attn)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out.astype(self.dtype))
        return out


class MultiHeadAttention(nn.Module):
    """Standard MHA for decoder self-attention (torch nn.MultiheadAttention
    equivalent: single qkv projections + output projection)."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None,
                 logit_bias: Optional[jnp.ndarray] = None,
                 key_bias: Optional[jnp.ndarray] = None,
                 box_prior=None, use_flash: bool = False):
        """attn_mask: (Q, K) or (B, Q, K) bool, True = BLOCKED (torch
        convention, reference dn_components.py:117-129).
        logit_bias: optional additive pre-softmax bias broadcastable to
        (B, n_heads, Q, K) — used by the dense decoder cross-attention's
        box-locality prior (an elementwise add XLA fuses into the QK^T
        producer, so it costs no extra HBM round-trip).
        use_flash routes through the fused VMEM-resident kernel
        (ops/flash_attn.py): the (B, M, Q, K) score tensor never touches
        HBM; key padding arrives as additive ``key_bias`` (B, K) and the
        box-locality prior as a decomposed ``box_prior`` (BoxPrior)
        recombined on-chip — mutually exclusive with attn_mask/logit_bias."""
        B, Lq, _ = q.shape
        M = self.n_heads
        D = self.d_model // M
        dense = lambda name: nn.DenseGeneral((M, D), dtype=self.dtype, name=name)
        qh = dense("q_proj")(q)
        kh = dense("k_proj")(k)
        vh = dense("v_proj")(v)
        if use_flash:
            from ..ops.flash_attn import flash_mha, pick_block_q

            assert attn_mask is None and logit_bias is None
            if key_bias is None:
                key_bias = jnp.zeros((B, k.shape[1]), jnp.float32)
            out = flash_mha(
                jnp.swapaxes(qh, 1, 2), jnp.swapaxes(kh, 1, 2),
                jnp.swapaxes(vh, 1, 2), key_bias, box_prior,
                pick_block_q(k.shape[1]),
                jax.default_backend() != "tpu",
            )
            out = jnp.swapaxes(out, 1, 2).astype(self.dtype)  # (B, Q, M, D)
        else:
            logits = jnp.einsum("bqmd,bkmd->bmqk", qh, kh) / math.sqrt(D)
            if logit_bias is not None:
                logits = logits + logit_bias.astype(logits.dtype)
            if attn_mask is not None:
                if attn_mask.ndim == 2:
                    blocked = attn_mask[None, None]
                else:
                    blocked = attn_mask[:, None]
                logits = jnp.where(blocked, jnp.finfo(logits.dtype).min, logits)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bmqk,bkmd->bqmd", weights, vh)
        return nn.DenseGeneral(self.d_model, axis=(-2, -1), dtype=self.dtype, name="out_proj")(out)
