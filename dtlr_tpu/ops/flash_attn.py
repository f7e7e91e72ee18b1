"""Fused (flash-style) multi-head attention for the dense decoder
cross-attention and decoder self-attention.

Why this exists: the round-4 roofline attribution (PERFORMANCE.md)
showed the flagship forward is HBM-bandwidth-bound at ~1.09x the v5e
peak by XLA bytes-accessed, and named the materialized attention-score
chain as the headroom: each of the 6 decoder layers round-trips a
(B, M, Q, S) fp32 score tensor (~822 MB at B=8, Q=900, S=3570) plus a
(B, Q, S) box-prior distance tensor through HBM. This kernel tiles
queries AND keys (flash-attention online softmax: running max/sum +
rescaled accumulator carried in VMEM scratch across the key-block grid
dimension), so scores live and die on-chip and only Q/K/V/out touch
HBM — and scoped-VMEM use is independent of S. (The first version
kept the full key set per (batch, head) in VMEM single-pass; that
died at big geometry: at S=14336 the kernel's scoped stack hit 17.1 MB
against Mosaic's 16 MB limit — key-tiling is the categorical fix.)

The box-locality log-prior (dense_box_prior_d2 in models/transformer.py)
is computed *inside* the kernel from per-query box parameters and
per-key pixel coordinates — a (BQ, L) x (L, S) level-select matmul plus
elementwise ops — so the (B, Q, S) d2 tensor never exists anywhere.
No gathers are involved (Mosaic on this backend lowers no dynamic
gather; probed, see PERFORMANCE.md) — everything is matmul + VPU.

Gradients: `flash_mha` carries a custom VJP whose backward recomputes
the attention with plain XLA ops and differentiates that — exact
(same math, float-associativity aside), so the kernel is safe in the
training step; the fwd saves HBM traffic, the bwd costs one dense
recompute (flash backward kernel is future work).

Reference counterpart being replaced: the reference runs this module
as MSDeformAttn CUDA sampling (models/dino/ops/src/cuda/
ms_deform_im2col_cuda.cuh); our dense-CA redesign replaced the gather
with MXU attention (models/transformer.py:194-225) and this kernel
removes that design's score-tensor HBM traffic.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on pure-CPU test hosts
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _pad_axis(x: jnp.ndarray, axis: int, mult: int,
              value: float = 0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


#: key-block size: 512 keeps every per-tile temporary ((BQ, BK) logits/
#: weights/box terms, (D, BK)/(BK, D) fp32 K/V staging) around ~3 MB of
#: scoped VMEM at BQ=128 — an order of magnitude under the 16 MB Mosaic
#: limit at ANY sequence length. 512 also divides both protocol
#: geometries' padded key counts exactly (flagship 3584, big 14336).
BLOCK_K = 512


def pick_block_q(S: int) -> int:
    """Query-block size. With key-tiling (BLOCK_K) the scoped-VMEM
    stack no longer scales with S, so the MXU-friendly maximum is
    always safe. Kept as a function: it is the model-wiring /
    probe-script seam where adaptivity lived when the kernel was
    single-pass over keys (and would live again if a geometry ever
    needs it)."""
    del S
    return 128


class BoxPrior(NamedTuple):
    """Per-query Gaussian locality prior ingredients, pre-level-select.

    cx, cy: (B, Q, L) box centers in padded-frame fractions (the frame
        reference_points_input lives in — transformer.py:102-127).
    ihw, ihh: (B, Q, L) reciprocals of the box half-extents (clamped).
    lvl_onehot: (L, S) fp32 one-hot level id per flattened key.
    px, py: (1, S) fp32 pixel-center coordinates per flattened key.
    gamma: (M,) fp32 per-head sharpness = exp(ca_box_gamma).
    """

    cx: jnp.ndarray
    cy: jnp.ndarray
    ihw: jnp.ndarray
    ihh: jnp.ndarray
    lvl_onehot: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    gamma: jnp.ndarray


def make_box_prior(reference_points_input: jnp.ndarray, spatial_shapes,
                   gamma: jnp.ndarray) -> BoxPrior:
    """Decompose the dense box prior into the small per-query /
    per-key arrays the kernel recombines on-chip. Mirrors
    dense_box_prior_d2 (transformer.py:102-127): for a level-l key
    pixel p and query box b, d2 = ((px-cx_l)/hw_l)^2 + ((py-cy_l)/hh_l)^2.
    """
    box = reference_points_input.astype(jnp.float32)  # (B, Q, L, 4)
    cx = box[..., 0]
    cy = box[..., 1]
    ihw = 1.0 / jnp.maximum(box[..., 2] * 0.5, 1e-3)
    ihh = 1.0 / jnp.maximum(box[..., 3] * 0.5, 1e-3)
    pxs, pys, lvls = [], [], []
    n_levels = len(spatial_shapes)
    for lvl, (h, w) in enumerate(spatial_shapes):
        py_l, px_l = jnp.meshgrid(
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
            indexing="ij",
        )
        pxs.append(px_l.reshape(-1))
        pys.append(py_l.reshape(-1))
        lvls.append(jnp.full((h * w,), lvl, jnp.int32))
    px = jnp.concatenate(pxs)[None, :]
    py = jnp.concatenate(pys)[None, :]
    lvl = jnp.concatenate(lvls)
    onehot = jax.nn.one_hot(lvl, n_levels, dtype=jnp.float32).T  # (L, S)
    return BoxPrior(cx, cy, ihw, ihh, onehot, px, py,
                    gamma.astype(jnp.float32))


# --------------------------------------------------------------- kernels
# Online-softmax accumulation step shared by both kernels. The key-block
# grid axis is innermost, so for a fixed (b, m, q-block) the kernel sees
# key blocks k = 0..nk-1 consecutively and carries (running max m,
# normalizer l, unnormalized accumulator acc) in VMEM scratch; the
# normalized output is written once, at k == nk-1 (Mosaic keeps the
# out block resident across the revisit chain and flushes it when the
# block index changes).
def _online_softmax_step(logits, v_ref, out_ref, acc_ref, m_ref, l_ref,
                         k, nk):
    m_prev = m_ref[:, :1]                          # (BQ, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                # rescale factor
    p = jnp.exp(logits - m_new)                    # (BQ, BK)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)            # (BK, D)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k == nk - 1)
    def _():
        out_ref[0, 0] = acc_ref[...] / l_ref[:, :1]


def _init_carry(acc_ref, m_ref, l_ref, k):
    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)


def _mha_kernel(q_ref, kt_ref, v_ref, kbias_ref, out_ref,
                acc_ref, m_ref, l_ref, *, scale, nk):
    k = pl.program_id(3)
    _init_carry(acc_ref, m_ref, l_ref, k)
    q = q_ref[0, 0].astype(jnp.float32)           # (BQ, D)
    kt = kt_ref[0, 0].astype(jnp.float32)         # (D, BK)
    logits = jnp.dot(q, kt, preferred_element_type=jnp.float32) * scale
    logits = logits + kbias_ref[0]                # (1, BK) -> broadcast
    _online_softmax_step(logits, v_ref, out_ref, acc_ref, m_ref, l_ref,
                         k, nk)


def _mha_box_kernel(q_ref, kt_ref, v_ref, kbias_ref, cx_ref, cy_ref,
                    ihw_ref, ihh_ref, onehot_ref, px_ref, py_ref,
                    gamma_ref, out_ref, acc_ref, m_ref, l_ref, *,
                    scale, nk):
    k = pl.program_id(3)
    _init_carry(acc_ref, m_ref, l_ref, k)
    q = q_ref[0, 0].astype(jnp.float32)           # (BQ, D)
    kt = kt_ref[0, 0].astype(jnp.float32)         # (D, BK)
    logits = jnp.dot(q, kt, preferred_element_type=jnp.float32) * scale
    # level-select: (BQ, L) @ (L, BK) -> per-key box params, on the MXU
    onehot = onehot_ref[...]                      # (L, BK)
    cxs = jnp.dot(cx_ref[0], onehot, preferred_element_type=jnp.float32)
    cys = jnp.dot(cy_ref[0], onehot, preferred_element_type=jnp.float32)
    ihws = jnp.dot(ihw_ref[0], onehot, preferred_element_type=jnp.float32)
    ihhs = jnp.dot(ihh_ref[0], onehot, preferred_element_type=jnp.float32)
    dx = (px_ref[...] - cxs) * ihws               # (1,BK)-(BQ,BK) bcast
    dy = (py_ref[...] - cys) * ihhs
    gamma = gamma_ref[0, 0, 0]
    logits = logits - (0.5 * gamma) * (dx * dx + dy * dy)
    logits = logits + kbias_ref[0]
    _online_softmax_step(logits, v_ref, out_ref, acc_ref, m_ref, l_ref,
                         k, nk)


def _flash_fwd(qh, kh, vh, key_bias, prior: Optional[BoxPrior],
               block_q: int, interpret: bool) -> jnp.ndarray:
    """qh (B, M, Q, D); kh/vh (B, M, S, D); key_bias (B, S) additive
    fp32 (-1e9 at padded keys). Returns (B, M, Q, D) fp32."""
    B, M, Q, D = qh.shape
    S = kh.shape[2]
    BQ = block_q
    qp = _pad_axis(qh, 2, BQ)
    Qp = qp.shape[2]
    # key-block size: BLOCK_K, shrunk to the (128-padded) key count when
    # the whole key set fits one block (nk=1 degenerates to single-pass)
    BK = min(BLOCK_K, S + (-S) % 128)
    # pad keys to a whole number of key blocks; padded keys are masked
    # via the bias (-1e9 -> exp underflows to exactly 0 post-max-shift)
    kp = _pad_axis(kh, 2, BK)
    vp = _pad_axis(vh, 2, BK)
    Sp = kp.shape[2]
    nk = Sp // BK
    # Mosaic requires the last two dims of every block shape to divide
    # (8, 128) or equal the full array dims — rank-3 kbias (B, 1, Sp)
    # makes its block (1, 1, BK) legal where (1, BK) of a (B, Sp) is not
    kbias = _pad_axis(key_bias.astype(jnp.float32), 1, BK,
                      value=-1e9)[:, None, :]
    ktp = jnp.swapaxes(kp, 2, 3)  # (B, M, D, Sp)
    # key-block axis innermost: consecutive k steps revisit the same
    # (b, m, i) out/scratch blocks, carrying the online-softmax state
    grid = (B, M, Qp // BQ, nk)
    scale = 1.0 / math.sqrt(D)

    common_specs = [
        pl.BlockSpec((1, 1, BQ, D), lambda b, m, i, k: (b, m, i, 0)),
        pl.BlockSpec((1, 1, D, BK), lambda b, m, i, k: (b, m, 0, k)),
        pl.BlockSpec((1, 1, BK, D), lambda b, m, i, k: (b, m, k, 0)),
        pl.BlockSpec((1, 1, BK), lambda b, m, i, k: (b, 0, k)),
    ]
    out_spec = pl.BlockSpec((1, 1, BQ, D), lambda b, m, i, k: (b, m, i, 0))
    out_shape = jax.ShapeDtypeStruct((B, M, Qp, D), jnp.float32)
    # online-softmax carry: unnormalized accumulator + running max /
    # normalizer (replicated across the 128-lane quantum)
    if not _HAS_PLTPU:  # pragma: no cover - the wiring gates on TPU
        raise NotImplementedError(
            "flash_mha needs jax.experimental.pallas.tpu for its VMEM "
            "scratch carry (available on CPU hosts too — only truly "
            "absent when the pallas TPU frontend cannot import)")
    scratch_shapes = [
        pltpu.VMEM((BQ, D), jnp.float32),
        pltpu.VMEM((BQ, 128), jnp.float32),
        pltpu.VMEM((BQ, 128), jnp.float32),
    ]
    flops = 2 * B * M * Qp * Sp * (2 * D + (8 if prior is not None else 0))
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(qp.size * nk + ktp.size + vp.size)
        * qp.dtype.itemsize + B * M * Qp * D * 4,
        transcendentals=B * M * Qp * Sp,
    )
    if prior is None:
        out = pl.pallas_call(
            functools.partial(_mha_kernel, scale=scale, nk=nk),
            grid=grid,
            in_specs=common_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            cost_estimate=cost,
            interpret=interpret,
        )(qp, ktp, vp, kbias)
    else:
        L = prior.lvl_onehot.shape[0]
        cxp = _pad_axis(prior.cx, 1, BQ)
        cyp = _pad_axis(prior.cy, 1, BQ)
        # padded queries divide by the pad's zero half-extents unless
        # the reciprocals are padded with a finite value
        ihwp = _pad_axis(prior.ihw, 1, BQ, value=1.0)
        ihhp = _pad_axis(prior.ihh, 1, BQ, value=1.0)
        onehotp = _pad_axis(prior.lvl_onehot, 1, BK)
        pxp = _pad_axis(prior.px, 1, BK)
        pyp = _pad_axis(prior.py, 1, BK)
        box_specs = [
            pl.BlockSpec((1, BQ, L), lambda b, m, i, k: (b, i, 0)),  # cx
            pl.BlockSpec((1, BQ, L), lambda b, m, i, k: (b, i, 0)),  # cy
            pl.BlockSpec((1, BQ, L), lambda b, m, i, k: (b, i, 0)),  # ihw
            pl.BlockSpec((1, BQ, L), lambda b, m, i, k: (b, i, 0)),  # ihh
            pl.BlockSpec((L, BK), lambda b, m, i, k: (0, k)),        # onehot
            pl.BlockSpec((1, BK), lambda b, m, i, k: (0, k)),        # px
            pl.BlockSpec((1, BK), lambda b, m, i, k: (0, k)),        # py
            pl.BlockSpec((1, 1, 1), lambda b, m, i, k: (m, 0, 0)),   # gamma
        ]
        out = pl.pallas_call(
            functools.partial(_mha_box_kernel, scale=scale, nk=nk),
            grid=grid,
            in_specs=common_specs + box_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            cost_estimate=cost,
            interpret=interpret,
        )(qp, ktp, vp, kbias, cxp, cyp, ihwp, ihhp, onehotp, pxp, pyp,
          prior.gamma.reshape(M, 1, 1))
    return out[:, :, :Q, :]


def dense_reference(qh, kh, vh, key_bias, prior: Optional[BoxPrior]):
    """Plain-XLA attention computing exactly the kernel's math — the
    custom-VJP backward (recompute) and the parity-test oracle."""
    D = qh.shape[-1]
    logits = jnp.einsum(
        "bmqd,bmkd->bmqk", qh.astype(jnp.float32), kh.astype(jnp.float32)
    ) / math.sqrt(D)
    if prior is not None:
        cxs = jnp.einsum("bql,lk->bqk", prior.cx, prior.lvl_onehot)
        cys = jnp.einsum("bql,lk->bqk", prior.cy, prior.lvl_onehot)
        ihws = jnp.einsum("bql,lk->bqk", prior.ihw, prior.lvl_onehot)
        ihhs = jnp.einsum("bql,lk->bqk", prior.ihh, prior.lvl_onehot)
        dx = (prior.px[:, None, :] - cxs) * ihws
        dy = (prior.py[:, None, :] - cys) * ihhs
        d2 = dx * dx + dy * dy
        logits = logits - (0.5 * prior.gamma)[None, :, None, None] * d2[:, None]
    logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bmqk,bmkd->bmqd", w, vh.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_mha(qh, kh, vh, key_bias, prior, block_q: int = 128,
              interpret: bool = False):
    """Fused attention: out (B, M, Q, D) fp32 from qh (B, M, Q, D),
    kh/vh (B, M, S, D), additive key_bias (B, S), optional BoxPrior."""
    return _flash_fwd(qh, kh, vh, key_bias, prior, block_q, interpret)


def _flash_mha_fwd(qh, kh, vh, key_bias, prior, block_q, interpret):
    out = _flash_fwd(qh, kh, vh, key_bias, prior, block_q, interpret)
    return out, (qh, kh, vh, key_bias, prior)


def _flash_mha_bwd(block_q, interpret, res, g):
    qh, kh, vh, key_bias, prior = res
    _, vjp = jax.vjp(
        lambda q, k, v, kb, pr: dense_reference(q, k, v, kb, pr),
        qh, kh, vh, key_bias, prior)
    return vjp(g)


flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)
