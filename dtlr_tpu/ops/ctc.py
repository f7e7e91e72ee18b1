"""CTC loss on x-sorted character detections.

Implements the reference's CTC construction exactly (reference
models/dino/dino.py:457-551):

1. sort the (num_queries) predictions by box x-center
2. sigmoid the class logits; prepend a synthesized blank column:
   - if sum(p) < 1 - eps: p_blank = 1 - sum(p)
   - else: p_blank = eps and the class probs are rescaled to (1 - eps)
3. interleave a constant near-pure-blank frame after every query
   (T doubles: 900 -> 1800), giving CTC room for repeated characters
4. CTC loss on log-probs with target labels shifted +1 (blank = 0)

The same math with ``eps = 0.03 / num_classes`` (and no interleave) is
the greedy decode path (reference evaluation.py:116-159).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def blank_synthesis(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4) cxcywh
    eps: float = 0.003,
) -> jnp.ndarray:
    """x-sort + blank column. Returns probs (B, nq, K+1), blank at 0."""
    order = jnp.argsort(pred_boxes[:, :, 0], axis=1)
    logits_sorted = jnp.take_along_axis(
        pred_logits.astype(jnp.float32), order[..., None], axis=1
    )
    p = jax.nn.sigmoid(logits_sorted)
    s = p.sum(-1)
    under = s < 1.0 - eps
    blank = jnp.where(under, 1.0 - s, eps)
    scale = jnp.where(under, 1.0, (1.0 - eps) / jnp.maximum(s, 1e-12))
    probs = jnp.concatenate([blank[..., None], p * scale[..., None]], axis=-1)
    return probs


def interleave_blanks(probs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, K+1) -> (B, 2T, K+1), inserting a constant blank frame
    after every prediction frame (reference dino.py:505-517)."""
    B, T, C = probs.shape
    blank_frame = jnp.full((B, T, C), 1e-5, probs.dtype).at[:, :, 0].set(1.0)
    out = jnp.stack([probs, blank_frame], axis=2).reshape(B, 2 * T, C)
    return out


def ctc_loss(
    pred_logits: jnp.ndarray,   # (B, nq, K)
    pred_boxes: jnp.ndarray,    # (B, nq, 4)
    labels: jnp.ndarray,        # (B, N) charset indices, padded
    label_valid: jnp.ndarray,   # (B, N) bool
    eps: float = 0.003,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean CTC loss, probs (B, nq, K+1) for decode/monitoring)."""
    probs = blank_synthesis(pred_logits, pred_boxes, eps)
    frames = interleave_blanks(probs)
    logprobs = jnp.log(frames)

    # optax.ctc_loss log-softmaxes internally; our rows already sum to ~1
    # (the interleaved blank rows sum to 1 + (K)*1e-5, a <0.2% renorm).
    B, T, _ = frames.shape
    logit_paddings = jnp.zeros((B, T), jnp.float32)
    shifted = jnp.where(label_valid, labels + 1, 0).astype(jnp.int32)
    label_paddings = (~label_valid).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logprobs, logit_paddings, shifted, label_paddings, blank_id=0
    )
    # optax log-softmaxes internally; the interleaved blank frames sum to
    # exactly 1 + K*1e-5 (K true classes at 1e-5 + blank at 1.0), so optax
    # scores every alignment lower than torch's unnormalized-log-prob
    # CTCLoss by exactly (T/2)*log1p(K*1e-5) — every path visits each
    # frame once and only the T/2 blank frames are unnormalized. Subtract
    # that constant for exact reference semantics (parity-tested against
    # reference SetCriterion.loss_CTC in test_torch_forward_parity.py).
    K = pred_logits.shape[-1]
    per_seq = per_seq - (T / 2) * jnp.log1p(K * 1e-5)
    # zero_infinity=True semantics (reference nn.CTCLoss(zero_infinity=True))
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    # torch CTCLoss(reduction='mean'): per-sequence loss / target_length,
    # then mean over batch
    tgt_len = jnp.maximum(label_valid.sum(-1).astype(jnp.float32), 1.0)
    loss = jnp.mean(per_seq / tgt_len)
    return loss, probs


def greedy_decode_probs(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4)
    num_classes: Optional[int] = None,
    eps_scale: float = 0.03,
) -> jnp.ndarray:
    """Greedy decode probs (reference evaluation.py:116-159): same blank
    synthesis with eps = eps_scale / K, no interleave. Argmax frames where
    argmax != 0 are characters (class = argmax - 1), read left to right."""
    K = pred_logits.shape[-1]
    return blank_synthesis(pred_logits, pred_boxes, eps=eps_scale / K)
