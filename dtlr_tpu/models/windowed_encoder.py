"""Windowed dense encoder — TPU-native alternative to the deformable
encoder.

Motivation: multi-scale deformable attention is gather-bound on TPU
(row-rate limited; see ops/deform_attn.py). For *text lines* the token
grid is short and wide, so dense attention inside full-height x
``win``-column windows maps straight onto the MXU with zero gathers.
Alternate layers shift the windows by win/2 (Swin-style, with the
wrapped window's cross-boundary pairs masked exactly as Swin does) so
information propagates along the line; a light cross-level mix (resize
+ 1x1 dense from the neighboring pyramid levels) replaces deformable
attention's cross-level sampling.

This is a deliberate architecture deviation (config
``encoder_type='windowed'``, default 'deformable' = reference-faithful).
The two-stage selection, decoder, and all losses are unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _window_attention(q, k, v, key_valid, n_heads: int, dtype,
                      col_allow=None, dims=None):
    """q,k,v: (Bw, N, C); key_valid: (Bw, N) bool.

    ``col_allow`` (nW, win, win) masks cross-segment pairs in shifted
    (rolled) windows, Swin-style: tokens wrapped from the other end of
    the line may share a window but must not attend to each other.
    ``dims`` = (B, nW, h, win) identifies the window layout.
    """
    Bw, N, C = q.shape
    D = C // n_heads
    qh = q.reshape(Bw, N, n_heads, D)
    kh = k.reshape(Bw, N, n_heads, D)
    vh = v.reshape(Bw, N, n_heads, D)
    logits = jnp.einsum("bnhd,bkhd->bhnk", qh, kh) / jnp.sqrt(D).astype(q.dtype)
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(key_valid[:, None, None, :], logits, neg)
    if col_allow is not None:
        B, nW, h, win = dims
        lg = logits.reshape(B, nW, n_heads, h, win, h, win)
        lg = jnp.where(col_allow[None, :, None, None, :, None, :], lg, neg)
        logits = lg.reshape(Bw, n_heads, N, N)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhnk,bkhd->bnhd", w, vh)
    return out.reshape(Bw, N, C)


class WindowedEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    win: int = 32          # columns per window (full height)
    shift: bool = False    # shift windows by win/2 (odd layers)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,              # (B, S, C) flattened levels
        pos: jnp.ndarray,              # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
        key_padding_mask: jnp.ndarray,  # (B, S) True = pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, S, C = src.shape
        # split projections: q/k read content+pos, v reads content only —
        # one combined qk plus one v matmul instead of computing a fused
        # qkv twice per layer (the math is unchanged; old fused-qkv
        # checkpoints remap exactly via checkpoints.migrate_windowed_qkv)
        qk = nn.DenseGeneral((2, C), axis=-1, dtype=self.dtype, name="qk")
        v_proj = nn.Dense(C, dtype=self.dtype, name="v_proj")
        out_proj = nn.Dense(C, dtype=self.dtype, name="out_proj")

        outs = []
        offset = 0
        level_feats = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            x = src[:, offset : offset + h * w].reshape(B, h, w, C)
            p = pos[:, offset : offset + h * w].reshape(B, h, w, C)
            valid = ~key_padding_mask[:, offset : offset + h * w].reshape(B, h, w)

            win = min(self.win, max(1, w))
            sh = win // 2 if (self.shift and w > win) else 0
            pad_w = (-w) % win
            xw = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            pw = jnp.pad(p, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
            vw = jnp.pad(valid, ((0, 0), (0, 0), (0, pad_w)))
            if sh:
                xw = jnp.roll(xw, -sh, axis=2)
                pw = jnp.roll(pw, -sh, axis=2)
                vw = jnp.roll(vw, -sh, axis=2)
            Wp = w + pad_w
            nW = Wp // win

            def part(t, c=C):
                t = t.reshape(B, h, nW, win, c) if c else t.reshape(B, h, nW, win)
                t = t.transpose(0, 2, 1, 3) if not c else t.transpose(0, 2, 1, 3, 4)
                return t.reshape(B * nW, h * win, c) if c else t.reshape(B * nW, h * win)

            if sh:
                # Swin-style shifted-window mask: after the roll the last
                # window holds both line ends; block cross-segment pairs
                import numpy as _np

                seg = _np.arange(Wp) >= Wp - sh
                segw = seg.reshape(nW, win)
                col_allow = jnp.asarray(segw[:, :, None] == segw[:, None, :])
            else:
                col_allow = None

            xq = part(xw) + part(pw)
            q2 = qk(xq)                     # (Bw, N, 2, C)
            vv = v_proj(part(xw))           # value from content only
            attn = _window_attention(
                q2[..., 0, :], q2[..., 1, :], vv, part(vw, 0),
                self.n_heads, self.dtype,
                col_allow=col_allow, dims=(B, nW, h, win),
            )
            attn = out_proj(attn)
            attn = attn.reshape(B, nW, h, win, C).transpose(0, 2, 1, 3, 4).reshape(B, h, Wp, C)
            if sh:
                attn = jnp.roll(attn, sh, axis=2)
            attn = attn[:, :, :w]
            level_feats.append((x + attn, h, w))
            offset += h * w

        # light cross-level mix: add resized neighbor levels through 1x1
        # denses (replaces deformable attention's cross-level sampling)
        mixed = []
        up_proj = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                           name="mix_up")
        down_proj = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                             name="mix_down")
        for lvl, (y, h, w) in enumerate(level_feats):
            acc = y
            if lvl + 1 < len(level_feats):
                coarse = level_feats[lvl + 1][0]
                acc = acc + up_proj(
                    jax.image.resize(coarse, (B, h, w, C), "bilinear").astype(self.dtype)
                )
            if lvl > 0:
                fine = level_feats[lvl - 1][0]
                acc = acc + down_proj(
                    jax.image.resize(fine, (B, h, w, C), "bilinear").astype(self.dtype)
                )
            mixed.append(acc.reshape(B, h * w, C))
        y = jnp.concatenate(mixed, axis=1)

        src = nn.LayerNorm(dtype=jnp.float32, name="norm1")(y)
        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ffn)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm2")(src + ffn)
        return src
