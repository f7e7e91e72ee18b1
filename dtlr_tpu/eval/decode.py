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


def postprocess_topk(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4) cxcywh
    num_select: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flattened query x class top-``num_select`` selection (reference
    PostProcess, models/dino/dino.py:996-1013): a query can emit more
    than one class and low-score queries drop out entirely.

    Returns (scores (B,S), labels (B,S), boxes (B,S,4) cxcywh)."""
    B, nq, K = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32)).reshape(B, nq * K)
    scores, idx = jax.lax.top_k(prob, min(num_select, nq * K))
    qidx = idx // K
    labels = idx % K
    boxes = jnp.take_along_axis(
        pred_boxes.astype(jnp.float32), qidx[..., None], axis=1
    )
    return scores, labels, boxes


def nms_decode(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4) cxcywh
    score_threshold: float,
    nms_iou: float,
    num_select: int | None = None,
) -> List[List[int]]:
    """NMS decode (reference evaluation.py:94-115): PostProcess with
    num_select=900 over the flattened query x class scores (reference
    hardcodes 900 at evaluation.py:97), class-agnostic NMS on xyxy
    boxes (dino.py:1030-1039), keep score > TH, sort by box x-center."""
    nq = pred_logits.shape[1]
    scores, labels, boxes = postprocess_topk(
        pred_logits, pred_boxes, num_select if num_select else nq
    )
    xyxy = box_cxcywh_to_xyxy(boxes)
    keep = batched_nms_mask(xyxy, scores, nms_iou)
    keep &= scores > score_threshold

    keep_np = np.asarray(keep)
    labels_np = np.asarray(labels)
    cx = np.asarray(boxes[..., 0])
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
