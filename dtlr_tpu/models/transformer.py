"""Deformable transformer: encoder, two-stage query selection, decoder
with iterative box refinement.

Re-designs reference models/dino/deformable_transformer.py:25-1005 as
static-shape flax modules:
- spatial_shapes is a static tuple (one compiled program per bucket)
- level flattening / start indices are compile-time constants
- two-stage top-k is a static k = num_queries
- the CDN query prefix has a static pad size (see cdn.py)

Config pinned by reference config/Latin.py:33-71: 6+6 layers, d=256,
8 heads, 4 levels, 4 points, ffn 2048, relu, two_stage 'standard',
embed_init_tgt=True, module_seq ['sa','ca','ffn'].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.boxes import inverse_sigmoid
from .layers import MLP, MSDeformAttn, MultiHeadAttention
from .windowed_encoder import WindowedEncoderLayer
from .position_encoding import gen_sineembed_for_position


def get_encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]], valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """Per-pixel normalized reference points (reference
    deformable_transformer.py:479-492). valid_ratios: (B, L, 2) in (w, h)
    order. Returns (B, S, L, 2)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ref_y = jnp.broadcast_to(ref_y, (h, w)).reshape(-1)
        ref_x = jnp.broadcast_to(ref_x, (h, w)).reshape(-1)
        # (B, HW)
        ry = ref_y[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = ref_x[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], axis=-1))
    reference_points = jnp.concatenate(refs, axis=1)  # (B, S, 2)
    return reference_points[:, :, None, :] * valid_ratios[:, None, :, :]


def get_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Fraction of non-padded H/W per level (reference :239-246).
    masks: list of (B, H, W) True-at-padding. Returns (B, L, 2) (w, h)."""
    ratios = []
    for m in masks:
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / m.shape[2], valid_h / m.shape[1]], axis=-1))
    return jnp.stack(ratios, axis=1)


def gen_encoder_output_proposals(
    memory: jnp.ndarray,
    padding_mask: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
):
    """Grid anchors per level + masked memory (reference
    models/dino/utils.py:15-64). Invalid proposals are pushed to a large
    finite logit (reference uses +inf; finite keeps downstream sigmoid
    NaN-free on TPU). Returns (output_memory, output_proposals,
    proposal_valid) with proposals in unsigmoided cxcywh."""
    B = memory.shape[0]
    proposals = []
    offset = 0
    BIG = 1e6
    for lvl, (h, w) in enumerate(spatial_shapes):
        mask_l = padding_mask[:, offset : offset + h * w].reshape(B, h, w)
        valid_h = jnp.sum(~mask_l[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~mask_l[:, 0, :], axis=1).astype(jnp.float32)

        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
        )
        grid = jnp.stack([gx, gy], axis=-1)  # (h, w, 2)
        scale = jnp.stack([valid_w, valid_h], axis=-1).reshape(B, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale
        wh = jnp.ones_like(grid) * 0.05 * (2.0 ** lvl)
        proposals.append(jnp.concatenate([grid, wh], axis=-1).reshape(B, -1, 4))
        offset += h * w

    output_proposals = jnp.concatenate(proposals, axis=1)
    valid = jnp.all(
        (output_proposals > 0.01) & (output_proposals < 0.99), axis=-1, keepdims=True
    )
    output_proposals = jnp.log(output_proposals / (1 - output_proposals))
    invalid = padding_mask[..., None] | ~valid
    output_proposals = jnp.where(invalid, BIG, output_proposals)
    output_memory = jnp.where(invalid, 0.0, memory)
    return output_memory, output_proposals, ~invalid[..., 0]


def dense_box_prior_d2(reference_points_input, spatial_shapes):
    """Squared distance from every flattened memory pixel to every query's
    current reference box, normalized by the box half-extent, for the
    dense decoder cross-attention's locality prior.

    `reference_points_input` is (B, nq, L, 4) cxcywh already scaled by
    per-level valid ratios, i.e. padded-frame fractions — the same frame
    as a level-l pixel center ((j+0.5)/W_l, (i+0.5)/H_l), so the two are
    directly comparable (this is the identical frame MSDeformAttn samples
    in; reference models/dino/ops grid_sample convention). Returns
    (B, nq, S) fp32 where 1.0 = the box boundary (sigma = half-extent).
    """
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        py, px = jnp.meshgrid(
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
            indexing="ij",
        )
        box = reference_points_input[:, :, lvl, :].astype(jnp.float32)
        half_w = jnp.maximum(box[..., 2] * 0.5, 1e-3)[..., None]  # (B,nq,1)
        half_h = jnp.maximum(box[..., 3] * 0.5, 1e-3)[..., None]
        dx = (px.reshape(-1)[None, None, :] - box[..., 0:1]) / half_w
        dy = (py.reshape(-1)[None, None, :] - box[..., 1:2]) / half_h
        parts.append(dx * dx + dy * dy)
    return jnp.concatenate(parts, axis=-1)


class EncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.0
    shared_offsets: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, key_padding_mask,
                 deterministic: bool = True):
        q = src + pos
        src2 = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            shared_offsets=self.shared_offsets, dtype=self.dtype, name="self_attn",
        )(q, reference_points, src, spatial_shapes, key_padding_mask)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm1")(src)

        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        ffn = nn.relu(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=deterministic)(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ffn)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(ffn)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm2")(src)
        return src


class DecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.0
    module_seq: Tuple[str, ...] = ("sa", "ca", "ffn")
    shared_offsets: bool = False
    ca_type: str = "deform"  # 'deform' (reference) | 'dense' (TPU MXU-native)
    box_bias: bool = False  # dense CA only: Gaussian box-locality log-prior
    flash: bool = False  # fused VMEM-resident attention (ops/flash_attn.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt,
        query_pos,
        reference_points_input,  # (B, nq, L, 4)
        memory,
        spatial_shapes,
        memory_key_padding_mask,
        self_attn_mask=None,
        memory_pos=None,  # (B, S, C) level+sine PE, used by ca_type='dense'
        deterministic: bool = True,
    ):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        def sa(t):
            q = k = t + query_pos
            # self-attention stays on the materialized path even with
            # flash on: its (Q, Q) scores are small (900^2, ~26 MB at
            # B=8), and the no-prior kernel variant hits a Mosaic
            # compile pathology on this backend (>7 min vs 7 s for the
            # box-prior kernel at flagship shapes; probed on-chip,
            # docs/evidence/r5_flash_probe.md)
            t2 = MultiHeadAttention(self.d_model, self.n_heads, dtype=self.dtype,
                                    name="self_attn")(
                q, k, t, self_attn_mask)
            return nn.LayerNorm(dtype=jnp.float32, name="norm2")(t + drop(t2))

        def ca(t):
            if self.ca_type == "dense":
                # dense Q x S cross-attention (DETR-style: keys carry the
                # level+sine positional encoding, values are content-only).
                # TPU rationale: exact deformable sampling is gather
                # row-rate-bound (~3.2 ms/layer floor at B=8, S=3570)
                # while the full dense attention costs the same 3.2 ms on
                # the MXU with none of the gather machinery (measured;
                # see PERFORMANCE.md). Config `decoder_ca='dense'`.
                # `flash` replaces the materialized score/bias chain with
                # the VMEM-resident kernel (ops/flash_attn.py) — the
                # round-4 roofline's prescribed HBM-traffic attack.
                if self.box_bias:
                    # deform's box-guided locality prior as a dense-attention
                    # log-bias: Gaussian in box-normalized distance, per-head
                    # learnable sharpness (gamma -> 0 recovers plain dense, so
                    # warm starts from a no-bias checkpoint stay well-behaved).
                    log_gamma = self.param("ca_box_gamma", nn.initializers.zeros,
                                           (self.n_heads,), jnp.float32)
                # flash requires the box prior: the no-prior kernel
                # variant compile-pathologizes on this backend (see sa)
                if self.flash and self.box_bias:
                    from ..ops.flash_attn import make_box_prior

                    prior = make_box_prior(reference_points_input,
                                           spatial_shapes,
                                           jnp.exp(log_gamma))
                    key_bias = jnp.where(memory_key_padding_mask, -1e9, 0.0
                                         ).astype(jnp.float32)
                    t2 = MultiHeadAttention(self.d_model, self.n_heads,
                                            dtype=self.dtype,
                                            name="cross_attn")(
                        t + query_pos, memory + memory_pos.astype(memory.dtype),
                        memory, key_bias=key_bias, box_prior=prior,
                        use_flash=True)
                else:
                    blocked = memory_key_padding_mask[:, None, :]  # (B, 1, S)
                    bias = None
                    if self.box_bias:
                        d2 = dense_box_prior_d2(reference_points_input,
                                                spatial_shapes)
                        bias = (-0.5 * jnp.exp(log_gamma)[None, :, None, None]
                                * d2[:, None, :, :])
                    t2 = MultiHeadAttention(self.d_model, self.n_heads,
                                            dtype=self.dtype,
                                            name="cross_attn")(
                        t + query_pos, memory + memory_pos.astype(memory.dtype),
                        memory, blocked, logit_bias=bias)
            else:
                t2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                                  self.n_points, shared_offsets=self.shared_offsets,
                                  dtype=self.dtype, name="cross_attn")(
                    t + query_pos, reference_points_input, memory, spatial_shapes,
                    memory_key_padding_mask)
            return nn.LayerNorm(dtype=jnp.float32, name="norm1")(t + drop(t2))

        def ffn(t):
            t2 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(t)
            t2 = drop(nn.relu(t2))
            t2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(t2)
            return nn.LayerNorm(dtype=jnp.float32, name="norm3")(t + drop(t2))

        fns = {"sa": sa, "ca": ca, "ffn": ffn}
        for name in self.module_seq:
            tgt = fns[name](tgt)
        return tgt


class DeformableTransformer(nn.Module):
    """Encoder + two-stage selection + decoder.

    __call__ returns (hs, references, hs_enc, ref_enc, init_box_proposal)
    shaped like the reference (deformable_transformer.py:429-434) but
    batch-major everywhere.
    """

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.0
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 900
    query_dim: int = 4
    module_seq: Tuple[str, ...] = ("sa", "ca", "ffn")
    shared_offsets: bool = False
    encoder_type: str = "deformable"  # or "windowed" (TPU-native dense)
    encoder_win: int = 32
    decoder_ca: str = "deform"  # or "dense" (TPU MXU-native cross-attn)
    dense_box_bias: bool = False  # dense CA: box-locality log-prior
    flash_attn: bool = False  # fused VMEM-resident decoder attention
    use_checkpoint: bool = False  # remat encoder/decoder layers
    dtype: Any = jnp.float32

    def setup(self):
        if self.encoder_type not in ("deformable", "windowed"):
            raise ValueError(
                f"encoder_type must be 'deformable' or 'windowed', got {self.encoder_type!r}"
            )
        if self.decoder_ca not in ("deform", "dense"):
            raise ValueError(
                f"decoder_ca must be 'deform' or 'dense', got {self.decoder_ca!r}"
            )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, self.d_model)
        )
        # static_argnums: spatial_shapes tuples and `deterministic` must
        # stay python values under remat
        # flax remat: scope is argument 0, so the spatial_shapes tuple is
        # at positional index (1 + its position in __call__); the
        # `deterministic` kwarg is closed over, not a remat argument
        EncLayerW = (
            nn.remat(WindowedEncoderLayer, static_argnums=(3,))
            if self.use_checkpoint else WindowedEncoderLayer
        )
        EncLayer = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if self.use_checkpoint else EncoderLayer
        )
        DecLayer = (
            nn.remat(DecoderLayer, static_argnums=(5,))
            if self.use_checkpoint else DecoderLayer
        )
        if self.encoder_type == "windowed":
            self.encoder_layers = [
                EncLayerW(self.d_model, self.d_ffn, self.n_heads,
                                     self.num_feature_levels, win=self.encoder_win,
                                     shift=bool(i % 2), dropout=self.dropout,
                                     dtype=self.dtype, name=f"encoder_layer_{i}")
                for i in range(self.num_encoder_layers)
            ]
        else:
            self.encoder_layers = [
                EncLayer(self.d_model, self.d_ffn, self.num_feature_levels, self.n_heads,
                             self.enc_n_points, self.dropout,
                             shared_offsets=self.shared_offsets, dtype=self.dtype,
                             name=f"encoder_layer_{i}")
                for i in range(self.num_encoder_layers)
            ]
        self.decoder_layers = [
            DecLayer(self.d_model, self.d_ffn, self.num_feature_levels, self.n_heads,
                         self.dec_n_points, self.dropout, self.module_seq,
                         shared_offsets=self.shared_offsets, ca_type=self.decoder_ca,
                         box_bias=self.dense_box_bias, flash=self.flash_attn,
                         dtype=self.dtype, name=f"decoder_layer_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=jnp.float32, name="decoder_norm")
        # two-stage head on encoder output
        self.enc_output = nn.Dense(self.d_model, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(dtype=jnp.float32, name="enc_output_norm")
        # learnable content queries (embed_init_tgt=True, reference :320-363)
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, self.d_model)
        )
        # positional query head: sine(4 coords -> 2*d) -> d
        self.ref_point_head = MLP(self.d_model, self.d_model, 2, dtype=self.dtype,
                                  name="ref_point_head")

    def __call__(
        self,
        srcs: Sequence[jnp.ndarray],        # per level (B, H, W, C)
        masks: Sequence[jnp.ndarray],       # per level (B, H, W) True=pad
        pos_embeds: Sequence[jnp.ndarray],  # per level (B, H, W, C)
        refpoint_embed: Optional[jnp.ndarray],  # (B, n_dn, 4) unsigmoided CDN queries
        tgt: Optional[jnp.ndarray],             # (B, n_dn, C) CDN content queries
        attn_mask: Optional[jnp.ndarray],       # (Q, Q) True=blocked
        enc_class_head,  # callable: (B, S, C) -> (B, S, num_classes)
        enc_bbox_head,   # callable: (B, S, C) -> (B, S, 4) delta
        dec_bbox_heads,  # list of callables per decoder layer
        deterministic: bool = True,
    ):
        B = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)

        src_flat = jnp.concatenate(
            [s.reshape(B, -1, self.d_model) for s in srcs], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                (p + self.level_embed[lvl][None, None, None, :]).reshape(B, -1, self.d_model)
                for lvl, p in enumerate(pos_embeds)
            ],
            axis=1,
        ).astype(self.dtype)
        valid_ratios = get_valid_ratios(masks)

        # ------------------------------------------------ encoder
        output = src_flat.astype(self.dtype)
        if self.encoder_type == "windowed":
            for layer in self.encoder_layers:
                output = layer(output, pos_flat, spatial_shapes, mask_flat,
                               deterministic=deterministic)
        else:
            enc_ref = get_encoder_reference_points(spatial_shapes, valid_ratios)
            for layer in self.encoder_layers:
                output = layer(output, pos_flat, enc_ref, spatial_shapes, mask_flat,
                               deterministic=deterministic)
        memory = output

        # ------------------------------------------------ two-stage selection
        output_memory, output_proposals, proposal_valid = gen_encoder_output_proposals(
            memory.astype(jnp.float32), mask_flat, spatial_shapes
        )
        output_memory = self.enc_output_norm(self.enc_output(output_memory.astype(self.dtype)))
        enc_outputs_class = enc_class_head(output_memory)          # (B, S, K)
        enc_outputs_coord = enc_bbox_head(output_memory).astype(jnp.float32) + output_proposals

        topk = self.num_queries
        scores = jnp.max(enc_outputs_class.astype(jnp.float32), axis=-1)
        scores = jnp.where(proposal_valid, scores, -1e9)  # never select padding
        _, topk_idx = jax.lax.top_k(scores, topk)  # (B, topk)

        take = lambda arr: jnp.take_along_axis(
            arr, topk_idx[..., None].astype(jnp.int32), axis=1
        )
        refpoint_embed_undetach = take(enc_outputs_coord)               # (B, nq, 4) unsig
        refpoint_embed_ = jax.lax.stop_gradient(refpoint_embed_undetach)
        init_box_proposal = jax.nn.sigmoid(take(output_proposals))
        tgt_undetach = take(output_memory)

        tgt_ = jnp.broadcast_to(
            self.tgt_embed[None].astype(self.dtype), (B, topk, self.d_model)
        )
        if refpoint_embed is not None:
            refpoint_embed_full = jnp.concatenate([refpoint_embed, refpoint_embed_], axis=1)
            tgt_full = jnp.concatenate([tgt.astype(self.dtype), tgt_], axis=1)
        else:
            refpoint_embed_full, tgt_full = refpoint_embed_, tgt_

        # ------------------------------------------------ decoder
        intermediate = []
        ref_points = []
        reference_points = jax.nn.sigmoid(refpoint_embed_full.astype(jnp.float32))
        ref_points.append(reference_points)
        out_dec = tgt_full
        for lid, layer in enumerate(self.decoder_layers):
            ref_input = (
                reference_points[:, :, None, :]
                * jnp.concatenate([valid_ratios, valid_ratios], axis=-1)[:, None, :, :]
            )  # (B, nq, L, 4)
            query_sine_embed = gen_sineembed_for_position(
                ref_input[:, :, 0, :], dim=self.d_model // 2
            )
            query_pos = self.ref_point_head(query_sine_embed.astype(self.dtype))

            out_dec = layer(
                out_dec,
                query_pos,
                ref_input,
                memory,
                spatial_shapes,
                mask_flat,
                self_attn_mask=attn_mask,
                memory_pos=pos_flat if self.decoder_ca == "dense" else None,
                deterministic=deterministic,
            )

            # iterative box refinement (reference :734-756). NB the delta is
            # computed on the *unnormed* layer output; the final per-layer
            # coords in DINO re-use the normed hs (reference dino.py:339-347).
            delta = dec_bbox_heads[lid](out_dec).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            reference_points = jax.lax.stop_gradient(new_ref)
            ref_points.append(new_ref)
            intermediate.append(self.decoder_norm(out_dec))

        hs = jnp.stack(intermediate)          # (n_dec, B, nq, C)
        references = jnp.stack(ref_points)    # (n_dec+1, B, nq, 4) sigmoided
        hs_enc = tgt_undetach[None]           # (1, B, nq, C)
        ref_enc = jax.nn.sigmoid(refpoint_embed_undetach)[None]
        return hs, references, hs_enc, ref_enc, init_box_proposal
