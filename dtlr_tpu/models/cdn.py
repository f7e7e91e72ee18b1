"""Contrastive DeNoising (CDN) query preparation — static-shape version.

Re-designs reference models/dino/dn_components.py:20-142 for TPU:

The reference sizes DN groups dynamically from the *batch max* target
count (dn_components.py:42-47) and scatters per-image variable-length
noised queries. On TPU everything is static:

- targets come padded to ``n_max`` with a validity mask
- the number of groups is ``G = max(1, dn_number // n_max)`` (the
  reference computes ``2*dn_number // (2*max_cnt)`` with the runtime
  max count; we substitute the static bound — same formula, static)
- the DN prefix has static length ``pad = G * 2 * n_max``; slot
  ``g*2*n_max + i`` is the positive for target i in group g, and slot
  ``g*2*n_max + n_max + i`` its negative
- invalid target slots get zero queries and are excluded from the DN
  loss via the validity mask

The attention-mask semantics are identical: matching queries cannot see
DN queries, and DN groups cannot see each other (dn_components.py:117-129).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.boxes import inverse_sigmoid


class CdnMeta(NamedTuple):
    pad_size: int       # static DN prefix length
    num_groups: int     # static number of pos/neg group pairs
    n_max: int          # static per-group positive width


def cdn_num_groups(dn_number: int, n_max: int) -> int:
    # reference: dn_number*2 // (2*max_cnt), clamped to >= 1
    return max(1, (2 * dn_number) // (2 * n_max))


def cdn_attn_mask(num_queries: int, meta: CdnMeta) -> jnp.ndarray:
    """(Q, Q) bool, True = blocked. Q = pad_size + num_queries."""
    pad, group = meta.pad_size, 2 * meta.n_max
    Q = pad + num_queries
    mask = jnp.zeros((Q, Q), dtype=bool)
    # matching queries cannot see DN queries
    mask = mask.at[pad:, :pad].set(True)
    # DN groups cannot see each other
    rows = jnp.arange(pad)
    row_group = rows // group
    col_group = jnp.concatenate(
        [rows // group, jnp.full((num_queries,), -1, dtype=jnp.int32)]
    )
    blocked = (col_group[None, :] >= 0) & (col_group[None, :] != row_group[:, None])
    mask = mask.at[:pad, :].set(blocked)
    return mask


def prepare_cdn(
    rng: jax.Array,
    labels: jnp.ndarray,        # (B, N) int32, padded
    boxes: jnp.ndarray,         # (B, N, 4) cxcywh in [0,1], padded
    valid: jnp.ndarray,         # (B, N) bool
    label_enc: jnp.ndarray,     # (labelbook, C) embedding table
    dn_number: int,
    label_noise_ratio: float,
    box_noise_scale: float,
    num_classes: int,
):
    """Returns (input_query_label (B,pad,C), input_query_bbox (B,pad,4)
    unsigmoided, meta)."""
    B, N = labels.shape
    G = cdn_num_groups(dn_number, N)
    pad = G * 2 * N
    meta = CdnMeta(pad_size=pad, num_groups=G, n_max=N)

    k_flip, k_which, k_sign, k_mag = jax.random.split(rng, 4)

    # tile targets into (B, G, 2, N)
    lab = jnp.broadcast_to(labels[:, None, None, :], (B, G, 2, N))
    box = jnp.broadcast_to(boxes[:, None, None, :, :], (B, G, 2, N, 4))
    val = jnp.broadcast_to(valid[:, None, None, :], (B, G, 2, N))

    # ---- label noise: flip with p = ratio*0.5 (reference :64-70 applies it
    # to even flat indices, i.e. an effective 50% gate on top of the ratio)
    p = jax.random.uniform(k_flip, (B, G, 2, N))
    gate = (
        jnp.arange(pad).reshape(G, 2, N) % 2 == 0
    )  # even slots only, mirroring the reference's index parity gate
    flip = (p < label_noise_ratio * 0.5) & gate[None]
    rand_lab = jax.random.randint(k_which, (B, G, 2, N), 0, num_classes)
    noised_lab = jnp.where(flip, rand_lab, lab)

    # ---- box noise (reference :79-96): corners jittered by +-rand*wh/2*scale;
    # negatives (second half of each group) get magnitude in (1, 2]
    if box_noise_scale > 0:
        xy, wh = box[..., :2], box[..., 2:]
        corners = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        diff = jnp.concatenate([wh / 2, wh / 2], axis=-1)
        sign = jax.random.randint(k_sign, (B, G, 2, N, 4), 0, 2) * 2.0 - 1.0
        mag = jax.random.uniform(k_mag, (B, G, 2, N, 4))
        is_neg = jnp.zeros((G, 2, N), bool).at[:, 1, :].set(True)
        mag = mag + is_neg[None, ..., None].astype(mag.dtype)
        corners = corners + sign * mag * diff * box_noise_scale
        corners = jnp.clip(corners, 0.0, 1.0)
        noised_box = jnp.concatenate(
            [(corners[..., :2] + corners[..., 2:]) / 2, corners[..., 2:] - corners[..., :2]],
            axis=-1,
        )
    else:
        noised_box = box

    emb = jnp.take(label_enc, noised_lab.reshape(B, pad), axis=0)
    emb = jnp.where(val.reshape(B, pad)[..., None], emb, 0.0)
    qbox = inverse_sigmoid(noised_box.reshape(B, pad, 4))
    qbox = jnp.where(val.reshape(B, pad)[..., None], qbox, 0.0)
    return emb, qbox, meta
