"""On-device NMS with static shapes.

Replaces torchvision.ops.nms used by the reference PostProcess
(reference models/dino/dino.py:1030-1039, evaluation.py:94-115).
Iterative greedy suppression over score-sorted boxes via lax.scan —
static (n_boxes) shapes, returns a keep mask instead of indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.boxes import pairwise_box_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """boxes (n, 4) xyxy, scores (n,) -> keep mask (n,) bool."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou, _ = pairwise_box_iou(boxes_sorted, boxes_sorted)  # (n, n)

    def body(keep, i):
        # i is suppressed if any kept higher-scored box overlaps > thr
        overlap = (iou[i] > iou_threshold) & keep & (jnp.arange(n) < i)
        keep = keep.at[i].set(~jnp.any(overlap))
        return keep, None

    keep_sorted, _ = jax.lax.scan(body, jnp.ones((n,), bool), jnp.arange(n))
    # unsort
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(boxes, scores, iou_threshold: float):
    return jax.vmap(lambda b, s: nms_mask(b, s, iou_threshold))(boxes, scores)
