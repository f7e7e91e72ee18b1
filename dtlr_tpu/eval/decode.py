"""Output -> text decoding: greedy and NMS paths.

reference evaluation.py:92-160 convert_output_to_pred:
- greedy: x-sort + blank synthesis (eps = 0.03/K) -> argmax per query,
  drop blanks, charset[argmax - 1] left-to-right
- NMS: PostProcess(num_select=900, nms_iou) -> score > TH -> sort by
  box x-center -> charset[label]
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ctc import blank_synthesis
from ..ops.nms import batched_nms_mask
from ..utils.boxes import box_cxcywh_to_xyxy


def greedy_decode(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4)
    eps_scale: float = 0.03,
) -> np.ndarray:
    """Returns (B, nq) int32: class+1 per x-sorted query, 0 = blank."""
    K = pred_logits.shape[-1]
    probs = blank_synthesis(pred_logits, pred_boxes, eps=eps_scale / K)
    return np.asarray(jnp.argmax(probs, axis=-1), np.int32)


def greedy_labels(frame_argmax: np.ndarray) -> List[List[int]]:
    """Drop blank frames; labels are argmax-1 (no CTC collapse —
    reference evaluation.py:151-158 keeps repeats)."""
    out = []
    for row in frame_argmax:
        out.append([int(v) - 1 for v in row if v != 0])
    return out


def nms_decode(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4) cxcywh
    score_threshold: float,
    nms_iou: float,
) -> List[List[int]]:
    """NMS decode (reference evaluation.py:94-115): per-query best class
    (the reference's top-900 over query x class with 900 queries reduces
    to per-query max), NMS on xyxy boxes, keep score > TH, x-sort."""
    probs = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    scores = jnp.max(probs, axis=-1)         # (B, nq)
    labels = jnp.argmax(probs, axis=-1)      # (B, nq)
    xyxy = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
    keep = batched_nms_mask(xyxy, scores, nms_iou)
    keep &= scores > score_threshold

    keep_np = np.asarray(keep)
    labels_np = np.asarray(labels)
    cx = np.asarray(pred_boxes[..., 0])
    out = []
    for b in range(keep_np.shape[0]):
        idx = np.nonzero(keep_np[b])[0]
        idx = idx[np.argsort(cx[b, idx], kind="stable")]
        out.append([int(labels_np[b, i]) for i in idx])
    return out


def labels_to_text(labels: Sequence[int], charset: Sequence[str],
                   token_based: bool = False) -> str:
    chars = [charset[i] for i in labels if 0 <= i < len(charset)]
    return (" " if token_based else "").join(chars)
