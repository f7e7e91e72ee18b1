"""Detection + CTC losses, fully static-shape.

Re-implements reference SetCriterion (models/dino/dino.py:428-982):
- focal classification loss (:553-600)
- L1 + GIoU box loss (:618-650)
- cardinality error, logging only (:602-616)
- DN losses with fixed pos/neg slot indexing (:815-863)
- CTC loss via x-sorted queries + synthesized blank (:457-551)

Targets are padded: labels (B, N), boxes (B, N, 4) cxcywh, valid (B, N).
Matching is an assignment array (B, N): query index per target, -1 for
invalid targets (see ops/matcher.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.matcher import hungarian_match
from ..utils.boxes import (
    box_cxcywh_to_xyxy,
    elementwise_generalized_box_iou,
)


def focal_label_loss(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    assign: jnp.ndarray,       # (B, N) query index per target, -1 invalid
    labels: jnp.ndarray,       # (B, N)
    valid: jnp.ndarray,        # (B, N)
    num_boxes: jnp.ndarray,
    focal_alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    B, nq, K = pred_logits.shape
    logits = pred_logits.astype(jnp.float32)

    # build one-hot targets: matched queries get their class, rest zeros
    safe_q = jnp.where((assign >= 0) & valid, assign, nq)  # drop -> padded row
    onehot = jnp.zeros((B, nq + 1, K), jnp.float32)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], assign.shape)
    onehot = onehot.at[batch_idx, safe_q, labels].add(
        jnp.where(valid, 1.0, 0.0), mode="drop"
    )
    onehot = jnp.clip(onehot[:, :nq], 0.0, 1.0)

    prob = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
    loss = alpha_t * loss
    # reference: loss.mean(1).sum() / num_boxes * nq == total_sum / num_boxes
    return loss.sum() / num_boxes


def box_losses(
    pred_boxes: jnp.ndarray,  # (B, nq, 4)
    assign: jnp.ndarray,      # (B, N)
    tgt_boxes: jnp.ndarray,   # (B, N, 4)
    valid: jnp.ndarray,       # (B, N)
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    matched = (assign >= 0) & valid
    safe_q = jnp.where(matched, assign, 0).astype(jnp.int32)
    src = jnp.take_along_axis(
        pred_boxes.astype(jnp.float32), safe_q[..., None], axis=1
    )  # (B, N, 4)
    m = matched.astype(jnp.float32)
    l1 = jnp.abs(src - tgt_boxes.astype(jnp.float32))
    loss_bbox = (l1.sum(-1) * m).sum() / num_boxes
    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt_boxes.astype(jnp.float32))
    )
    loss_giou = ((1.0 - giou) * m).sum() / num_boxes
    loss_xy = (l1[..., :2].sum(-1) * m).sum() / num_boxes
    loss_hw = (l1[..., 2:].sum(-1) * m).sum() / num_boxes
    return {
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "loss_xy": jax.lax.stop_gradient(loss_xy),
        "loss_hw": jax.lax.stop_gradient(loss_hw),
    }


def cardinality_error(pred_logits, valid) -> jnp.ndarray:
    """Logging-only (reference :602-616)."""
    K = pred_logits.shape[-1]
    card_pred = jnp.sum(jnp.argmax(pred_logits, -1) != K - 1, axis=1)
    tgt_len = valid.sum(axis=1)
    return jax.lax.stop_gradient(
        jnp.mean(jnp.abs(card_pred.astype(jnp.float32) - tgt_len.astype(jnp.float32)))
    )


def dn_assignment(n_max: int, num_groups: int) -> jnp.ndarray:
    """Fixed DN positive-slot assignment: target i of group g sits at
    slot g*2*n_max + i (reference dino.py:818-833). Returns (G*N,)."""
    g = jnp.arange(num_groups)[:, None]
    i = jnp.arange(n_max)[None, :]
    return (g * 2 * n_max + i).reshape(-1).astype(jnp.int32)


def detection_loss(
    outputs: Dict,
    targets: Dict,           # labels (B,N), boxes (B,N,4), valid (B,N)
    num_classes: int,
    weight_dict: Dict[str, float],
    focal_alpha: float = 0.25,
    matcher_impl: str = "jax",
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
):
    """Full DINO detection loss (reference forward_standard, dino.py:780-964).

    Returns (total_loss, loss_dict). loss_dict holds unweighted values.
    """
    labels = targets["labels"].astype(jnp.int32)
    boxes = targets["boxes"].astype(jnp.float32)
    valid = targets["valid"]
    B, N = labels.shape

    num_boxes = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

    def match(out):
        return hungarian_match(
            out["pred_logits"], out["pred_boxes"], labels, boxes, valid,
            impl=matcher_impl, cost_class=cost_class, cost_bbox=cost_bbox,
            cost_giou=cost_giou, focal_alpha=focal_alpha,
        )

    def standard_losses(out, assign, nb):
        d = {"loss_ce": focal_label_loss(
            out["pred_logits"], assign, labels, valid, nb, focal_alpha)}
        d.update(box_losses(out["pred_boxes"], assign, boxes, valid, nb))
        return d

    losses: Dict[str, jnp.ndarray] = {}

    # main decoder output
    assign = match(outputs)
    losses.update(standard_losses(outputs, assign, num_boxes))
    losses["cardinality_error"] = cardinality_error(outputs["pred_logits"], valid)

    # aux decoder layers
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        a = match(aux)
        for k, v in standard_losses(aux, a, num_boxes).items():
            losses[f"{k}_{i}"] = v

    # encoder (interm) output
    if "interm_outputs" in outputs:
        interm = outputs["interm_outputs"]
        a = match(interm)
        for k, v in standard_losses(interm, a, num_boxes).items():
            losses[f"{k}_interm"] = v

    # DN losses: fixed slot assignment, no matching
    if "dn_outputs" in outputs and outputs.get("dn_meta") is not None:
        meta = outputs["dn_meta"]
        G = meta.num_groups
        dn_q = dn_assignment(meta.n_max, G)  # (G*N,)
        dn_assign = jnp.broadcast_to(dn_q[None], (B, G * N))
        dn_labels = jnp.tile(labels, (1, G))
        dn_boxes = jnp.tile(boxes, (1, G, 1))
        dn_valid = jnp.tile(valid, (1, G))
        nb_dn = num_boxes * G
        dn_out = outputs["dn_outputs"]
        d = {"loss_ce_dn": focal_label_loss(
            dn_out["pred_logits"], dn_assign, dn_labels, dn_valid, nb_dn, focal_alpha)}
        for k, v in box_losses(dn_out["pred_boxes"], dn_assign, dn_boxes, dn_valid, nb_dn).items():
            d[f"{k}_dn"] = v
        losses.update(d)
        for i, aux in enumerate(dn_out.get("aux_outputs", [])):
            d = {f"loss_ce_dn_{i}": focal_label_loss(
                aux["pred_logits"], dn_assign, dn_labels, dn_valid, nb_dn, focal_alpha)}
            for k, v in box_losses(aux["pred_boxes"], dn_assign, dn_boxes, dn_valid, nb_dn).items():
                d[f"{k}_dn_{i}"] = v
            losses.update(d)

    total = sum(
        losses[k] * w for k, w in weight_dict.items() if k in losses
    )
    return total, losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """reference models/dino/dino.py:1124-1165."""
    wd = {
        "loss_ce": cfg.cls_loss_coef,
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
    }
    clean_wo_dn = dict(wd)
    if cfg.get_default("use_dn", True):
        wd.update({
            "loss_ce_dn": cfg.cls_loss_coef,
            "loss_bbox_dn": cfg.bbox_loss_coef,
            "loss_giou_dn": cfg.giou_loss_coef,
        })
    clean = dict(wd)
    if cfg.get_default("aux_loss", True):
        for i in range(cfg.dec_layers - 1):
            wd.update({f"{k}_{i}": v for k, v in clean.items()})
    if cfg.get_default("two_stage_type", "standard") != "no":
        coeff = {
            "loss_ce": 1.0,
            "loss_bbox": 0.0 if cfg.get_default("no_interm_box_loss", False) else 1.0,
            "loss_giou": 0.0 if cfg.get_default("no_interm_box_loss", False) else 1.0,
        }
        interm_coef = cfg.get_default("interm_loss_coef", 1.0)
        wd.update({
            f"{k}_interm": v * interm_coef * coeff[k] for k, v in clean_wo_dn.items()
        })
    wd["loss_CTC"] = cfg.get_default("CTC_loss_coef", 1.0)
    return wd
