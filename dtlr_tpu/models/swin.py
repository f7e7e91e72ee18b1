"""Swin Transformer backbone (optional, reference
models/dino/swin_transformer.py:435-727 selected via args.backbone in
build_backbone, backbone.py:172-205).

Compact flax implementation: 4x4 patch embed, stages of shifted-window
attention blocks with relative position bias, patch merging downsample,
per-stage LayerNorm on the returned features. NHWC, static shapes
(inputs are padded to window multiples inside each stage).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws: int, B: int, H: int, W: int):
    C = wins.shape[-1]
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW, ws*ws, C); mask: (nW_per_img, ws*ws, ws*ws) or None
        nW, N, C = x.shape
        M = self.num_heads
        D = C // M
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nW, N, 3, M, D).transpose(2, 0, 3, 1, 4), 3, 0)
        q, k, v = q[0], k[0], v[0]  # (nW, M, N, D)
        attn = jnp.einsum("wmnd,wmkd->wmnk", q, k) / jnp.sqrt(D).astype(q.dtype)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, M),
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = rpb_table[idx].reshape(N, N, M).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nmask = mask.shape[0]
            attn = attn.reshape(nW // nmask, nmask, M, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nW, M, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("wmnk,wmkd->wmnd", attn, v).transpose(0, 2, 1, 3).reshape(nW, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = self.window_size
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = self._attn_mask(Hp, Wp)
        else:
            mask = None

        wins = window_partition(y, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype,
                               name="attn")(wins, mask)
        y = window_reverse(wins, ws, B, Hp, Wp)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + y

        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z

    def _attn_mask(self, Hp: int, Wp: int):
        ws, sh = self.window_size, self.shift
        img = np.zeros((1, Hp, Wp, 1), np.int32)
        cnt = 0
        for hsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img[:, hsl, wsl, :] = cnt
                cnt += 1
        img = np.roll(img, (-sh, -sh), axis=(1, 2))
        wins = img.reshape(1, Hp // ws, ws, Wp // ws, ws, 1)
        wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
        mask = (wins[:, :, None] != wins[:, None, :]) * -100.0
        return jnp.asarray(mask, jnp.float32)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    return_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        # patch embed: 4x4 non-overlapping conv
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(x)
        outs = []
        dim = self.embed_dim
        for st, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[st], self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{st}_block{b}",
                )(x)
            outs.append(
                nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{st}")(x)
            )
            if st < len(self.depths) - 1:
                # patch merging (downsample 2x, dim 2x)
                B, H, W, C = x.shape
                ph, pw = H % 2, W % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
                    axis=-1,
                )
                x = nn.LayerNorm(dtype=jnp.float32, name=f"merge_norm{st}")(x)
                x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                             name=f"merge_reduce{st}")(x)
                dim *= 2
        return tuple(outs[i] for i in self.return_indices)


SWIN_CONFIGS = {
    "swin_T_224_1k": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_S_224_1k": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_B_224_22k": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_L_224_22k": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def build_swin(name: str, return_indices=(1, 2, 3), dtype=jnp.float32):
    if name not in SWIN_CONFIGS:
        raise ValueError(f"unknown swin variant {name!r}")
    cfg = SWIN_CONFIGS[name]
    model = SwinTransformer(return_indices=tuple(return_indices), dtype=dtype, **cfg)
    dims = [cfg["embed_dim"] * (2 ** i) for i in range(4)]
    num_channels = [dims[i] for i in return_indices]
    return model, num_channels
