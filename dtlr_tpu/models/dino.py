"""DINO character-detection model (top level).

Re-designs reference models/dino/dino.py:49-415 as a static-shape flax
module. Forward contract (batch-major, static shapes):

    outputs = model.apply(params, images, image_valid_hw, targets?, rngs?)

returns a dict with
    pred_logits      (B, nq, K)        last decoder layer, matching part
    pred_boxes       (B, nq, 4)        sigmoided cxcywh
    aux_outputs      list of {pred_logits, pred_boxes} for layers 0..n-2
    interm_outputs   {pred_logits, pred_boxes} encoder proposals
    dn_*             DN split (training with CDN only)

Differences from the reference, by TPU design:
- padding is carried as per-image valid (h, w) sizes; per-level pad
  masks are computed arithmetically instead of interpolating a pixel
  mask (reference dino.py:303-308) — identical semantics for
  rectangle-valid images, which is the only case the data layer emits.
- CDN prefix is static (see cdn.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cdn import cdn_attn_mask, prepare_cdn
from .layers import MLP
from .position_encoding import sine_position_embedding_hw
from .resnet import build_resnet
from .transformer import DeformableTransformer


def level_pad_mask(valid_hw: jnp.ndarray, h: int, w: int, img_h: int, img_w: int):
    """(B, 2) valid pixel sizes -> (B, h, w) True-at-padding mask for a
    level of shape (h, w) downsampled from (img_h, img_w)."""
    # nearest-style: a level cell is valid if its (left/top-aligned) source
    # pixel is valid, matching F.interpolate(mode='nearest') on the mask.
    ys = (jnp.arange(h, dtype=jnp.float32) * (img_h / h)).astype(jnp.int32)
    xs = (jnp.arange(w, dtype=jnp.float32) * (img_w / w)).astype(jnp.int32)
    vy = ys[None, :] < valid_hw[:, 0:1]  # (B, h)
    vx = xs[None, :] < valid_hw[:, 1:2]  # (B, w)
    return ~(vy[:, :, None] & vx[:, None, :])


class ClassHead(nn.Module):
    num_classes: int
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        return nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype,
            name="fc",
        )(x)


class BboxHead(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="layers_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="layers_1")(x)
        x = nn.relu(x)
        # zero-init last layer (reference dino.py:167-168)
        return nn.Dense(
            4,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="layers_2",
        )(x)


class DINO(nn.Module):
    num_classes: int = 166
    num_queries: int = 900
    hidden_dim: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.0
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    backbone: str = "resnet50"
    norm_kind: str = "frozen_bn"
    return_interm_indices: Tuple[int, ...] = (1, 2, 3)
    module_seq: Tuple[str, ...] = ("sa", "ca", "ffn")
    # CDN
    use_dn: bool = True
    dn_number: int = 100
    dn_box_noise_scale: float = 0.4
    dn_label_noise_ratio: float = 0.5
    dn_labelbook_size: int = 167
    # static target capacity
    max_targets: int = 256
    shared_offsets: bool = False
    encoder_type: str = "deformable"
    encoder_win: int = 32
    decoder_ca: str = "deform"
    dense_box_bias: bool = False
    flash_attn: bool = False
    use_checkpoint: bool = False
    # sine PE temperatures (reference config/Latin.py:31-32)
    pe_temperature_h: float = 20.0
    pe_temperature_w: float = 20.0
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone.startswith("resnet"):
            backbone, num_channels = build_resnet(
                self.backbone, self.norm_kind, self.return_interm_indices,
                dtype=self.dtype,
            )
        elif self.backbone.startswith("swin"):
            from .swin import build_swin

            backbone, num_channels = build_swin(
                self.backbone, self.return_interm_indices, dtype=self.dtype
            )
        elif self.backbone.startswith("convnext"):
            from .convnext import build_convnext

            backbone, num_channels = build_convnext(
                self.backbone, self.return_interm_indices, dtype=self.dtype
            )
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        self.backbone_net = backbone
        self.backbone_channels = num_channels

        projs = []
        n_backbone = len(num_channels)
        for i in range(self.num_feature_levels):
            if i < n_backbone:
                projs.append(
                    (
                        nn.Conv(self.hidden_dim, (1, 1), use_bias=True,
                                dtype=self.dtype, name=f"input_proj_{i}_conv"),
                        nn.GroupNorm(num_groups=32, name=f"input_proj_{i}_norm"),
                    )
                )
            else:
                projs.append(
                    (
                        nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)], use_bias=True,
                                dtype=self.dtype, name=f"input_proj_{i}_conv"),
                        nn.GroupNorm(num_groups=32, name=f"input_proj_{i}_norm"),
                    )
                )
        self.input_projs = projs

        self.transformer = DeformableTransformer(
            d_model=self.hidden_dim,
            n_heads=self.n_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            d_ffn=self.d_ffn,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points,
            dec_n_points=self.dec_n_points,
            num_queries=self.num_queries,
            module_seq=self.module_seq,
            shared_offsets=self.shared_offsets,
            encoder_type=self.encoder_type,
            encoder_win=self.encoder_win,
            decoder_ca=self.decoder_ca,
            dense_box_bias=self.dense_box_bias,
            flash_attn=self.flash_attn,
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
            name="transformer",
        )

        # shared decoder heads (dec_pred_*_share=True, reference :170-189)
        self.class_embed = ClassHead(self.num_classes, dtype=self.dtype, name="class_embed")
        self.bbox_embed = BboxHead(self.hidden_dim, dtype=self.dtype, name="bbox_embed")
        # separate encoder (two-stage) heads (two_stage_*_share=False)
        self.enc_out_class_embed = ClassHead(
            self.num_classes, dtype=self.dtype, name="enc_out_class_embed"
        )
        self.enc_out_bbox_embed = BboxHead(
            self.hidden_dim, dtype=self.dtype, name="enc_out_bbox_embed"
        )
        # CDN label encoder (reference dino.py:99)
        self.label_enc = self.param(
            "label_enc",
            nn.initializers.normal(1.0),
            (self.dn_labelbook_size + 1, self.hidden_dim),
        )

    def __call__(
        self,
        images: jnp.ndarray,           # (B, H, W, 3) normalized, padded
        valid_hw: jnp.ndarray,         # (B, 2) int32 valid (h, w) per image
        targets: Optional[dict] = None,  # {labels (B,N), boxes (B,N,4), valid (B,N)}
        train: bool = False,
    ) -> dict:
        B, H, W, _ = images.shape
        feats = self.backbone_net(images.astype(self.dtype))

        srcs, masks, poss = [], [], []
        for lvl, feat in enumerate(feats):
            conv, norm = self.input_projs[lvl]
            srcs.append(norm(conv(feat)))
            m = level_pad_mask(valid_hw, feat.shape[1], feat.shape[2], H, W)
            masks.append(m)
            poss.append(
                sine_position_embedding_hw(
                    m, num_pos_feats=self.hidden_dim // 2,
                    temperature_h=self.pe_temperature_h,
                    temperature_w=self.pe_temperature_w,
                )
            )
        for lvl in range(len(feats), self.num_feature_levels):
            conv, norm = self.input_projs[lvl]
            src = norm(conv(feats[-1] if lvl == len(feats) else srcs[-1]))
            srcs.append(src)
            m = level_pad_mask(valid_hw, src.shape[1], src.shape[2], H, W)
            masks.append(m)
            poss.append(
                sine_position_embedding_hw(
                    m, num_pos_feats=self.hidden_dim // 2,
                    temperature_h=self.pe_temperature_h,
                    temperature_w=self.pe_temperature_w,
                )
            )

        use_cdn = train and self.use_dn and targets is not None
        if use_cdn:
            rng = self.make_rng("dn")
            input_query_label, input_query_bbox, meta = prepare_cdn(
                rng,
                targets["labels"].astype(jnp.int32),
                targets["boxes"].astype(jnp.float32),
                targets["valid"],
                self.label_enc,
                self.dn_number,
                self.dn_label_noise_ratio,
                self.dn_box_noise_scale,
                self.num_classes,
            )
            attn_mask = cdn_attn_mask(self.num_queries, meta)
            pad_size = meta.pad_size
        else:
            input_query_label = input_query_bbox = attn_mask = None
            meta = None
            pad_size = 0

        dec_bbox_heads = [self.bbox_embed] * self.num_decoder_layers
        hs, references, hs_enc, ref_enc, init_box_proposal = self.transformer(
            srcs,
            masks,
            poss,
            input_query_bbox,
            input_query_label,
            attn_mask,
            enc_class_head=self.enc_out_class_embed,
            enc_bbox_head=self.enc_out_bbox_embed,
            dec_bbox_heads=dec_bbox_heads,
            deterministic=not train,
        )
        # guard label_enc against being unused in eval graphs (reference
        # dino.py:335 adds label_enc*0 for the same reason)
        hs = hs + (self.label_enc[0, 0] * 0.0).astype(hs.dtype)

        # per-layer outputs: coords from normed hs + pre-layer reference.
        # The heads are SHARED across decoder layers
        # (dec_pred_*_share=True, reference dino.py:170-189), so apply
        # them ONCE over the stacked (n_dec, B, nq, C) tensor: one MXU
        # GEMM at 6x the rows instead of 6 underfilled 900-row GEMMs
        # per head (fp-identical — same weights, same per-row math).
        from ..utils.boxes import inverse_sigmoid  # local to avoid cycle

        delta = self.bbox_embed(hs).astype(jnp.float32)  # (n_dec, B, nq, 4)
        # references[lid] is the pre-layer reference (sigmoided)
        outputs_coord = jax.nn.sigmoid(
            delta + inverse_sigmoid(references[: self.num_decoder_layers])
        )
        outputs_class = self.class_embed(hs).astype(jnp.float32)

        out = {}
        if use_cdn and pad_size > 0:
            dn_class = outputs_class[:, :, :pad_size]
            dn_coord = outputs_coord[:, :, :pad_size]
            outputs_class = outputs_class[:, :, pad_size:]
            outputs_coord = outputs_coord[:, :, pad_size:]
            out["dn_meta"] = meta
            out["dn_outputs"] = {
                "pred_logits": dn_class[-1],
                "pred_boxes": dn_coord[-1],
                "aux_outputs": [
                    {"pred_logits": dn_class[i], "pred_boxes": dn_coord[i]}
                    for i in range(self.num_decoder_layers - 1)
                ],
            }

        out["pred_logits"] = outputs_class[-1]
        out["pred_boxes"] = outputs_coord[-1]
        out["aux_outputs"] = [
            {"pred_logits": outputs_class[i], "pred_boxes": outputs_coord[i]}
            for i in range(self.num_decoder_layers - 1)
        ]
        interm_class = self.enc_out_class_embed(hs_enc[-1]).astype(jnp.float32)
        out["interm_outputs"] = {
            "pred_logits": interm_class,
            "pred_boxes": ref_enc[-1].astype(jnp.float32),
        }
        out["interm_outputs_for_matching_pre"] = {
            "pred_logits": interm_class,
            "pred_boxes": init_box_proposal.astype(jnp.float32),
        }
        return out


def build_dino_from_config(cfg) -> DINO:
    """Model factory from a Config (reference models/dino/dino.py:1049-1194)."""
    dtype = jnp.bfloat16 if cfg.get_default("compute_dtype", "float32") == "bfloat16" else jnp.float32
    return DINO(
        num_classes=cfg.num_classes,
        num_queries=cfg.num_queries,
        hidden_dim=cfg.hidden_dim,
        n_heads=cfg.nheads,
        num_encoder_layers=cfg.enc_layers,
        num_decoder_layers=cfg.dec_layers,
        d_ffn=cfg.dim_feedforward,
        dropout=cfg.dropout,
        num_feature_levels=cfg.num_feature_levels,
        enc_n_points=cfg.enc_n_points,
        dec_n_points=cfg.dec_n_points,
        backbone=cfg.backbone,
        norm_kind=cfg.get_default("batch_norm_type", "FrozenBatchNorm2d"),
        module_seq=tuple(cfg.get_default("decoder_module_seq", ["sa", "ca", "ffn"])),
        use_dn=cfg.get_default("use_dn", True),
        dn_number=cfg.get_default("dn_number", 100),
        dn_box_noise_scale=cfg.get_default("dn_box_noise_scale", 0.4),
        dn_label_noise_ratio=cfg.get_default("dn_label_noise_ratio", 0.5),
        dn_labelbook_size=cfg.get_default("dn_labelbook_size", cfg.num_classes + 1),
        max_targets=cfg.get_default("max_targets", 256),
        shared_offsets=cfg.get_default("deform_shared_offsets", False),
        encoder_type=cfg.get_default("encoder_type", "deformable"),
        encoder_win=cfg.get_default("encoder_win", 32),
        decoder_ca=cfg.get_default("decoder_ca", "deform"),
        dense_box_bias=cfg.get_default("dense_box_bias", False),
        flash_attn=cfg.get_default("flash_attn", False),
        use_checkpoint=cfg.get_default("use_checkpoint", False),
        pe_temperature_h=float(cfg.get_default("pe_temperatureH", 20)),
        pe_temperature_w=float(cfg.get_default("pe_temperatureW", 20)),
        dtype=dtype,
    )
