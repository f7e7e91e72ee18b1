"""Parity tests for the fused flash-style attention kernel
(ops/flash_attn.py) against its plain-XLA reference, in Pallas
interpret mode (CPU). Covers: plain attention, key-padding bias, the
in-kernel box-locality prior (vs models/transformer.py
dense_box_prior_d2), non-aligned Q/S padding, and gradients through
the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtlr_tpu.ops.flash_attn import (
    BoxPrior,
    dense_reference,
    flash_mha,
    make_box_prior,
)

B, M, Q, S, D = 2, 4, 70, 200, 32
SPATIAL = ((8, 10), (4, 10), (2, 20), (2, 20))  # sums to 200


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    qh = _rand(ks[0], B, M, Q, D)
    kh = _rand(ks[1], B, M, S, D)
    vh = _rand(ks[2], B, M, S, D)
    key_bias = jnp.where(
        jax.random.uniform(ks[3], (B, S)) < 0.2, -1e9, 0.0
    ).astype(jnp.float32)
    ref = jax.random.uniform(ks[4], (B, Q, len(SPATIAL), 4),
                             minval=0.05, maxval=0.9)
    gamma = jnp.exp(_rand(ks[5], M) * 0.3)
    prior = make_box_prior(ref, SPATIAL, gamma)
    return qh, kh, vh, key_bias, prior


def test_plain_matches_reference(inputs):
    qh, kh, vh, key_bias, _ = inputs
    out = flash_mha(qh, kh, vh, key_bias, None, 128, True)
    ref = dense_reference(qh, kh, vh, key_bias, None)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_box_prior_matches_reference(inputs):
    qh, kh, vh, key_bias, prior = inputs
    out = flash_mha(qh, kh, vh, key_bias, prior, 128, True)
    ref = dense_reference(qh, kh, vh, key_bias, prior)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_box_prior_matches_transformer_d2(inputs):
    """The decomposed in-kernel prior must equal dense_box_prior_d2's
    materialized tensor (transformer.py:102-127) exactly."""
    from dtlr_tpu.models.transformer import dense_box_prior_d2

    _, _, _, _, prior = inputs
    ref_pts = jax.random.uniform(jax.random.PRNGKey(7),
                                 (B, Q, len(SPATIAL), 4),
                                 minval=0.05, maxval=0.9)
    d2_ref = dense_box_prior_d2(ref_pts, SPATIAL)
    p = make_box_prior(ref_pts, SPATIAL, prior.gamma)
    cxs = jnp.einsum("bql,lk->bqk", p.cx, p.lvl_onehot)
    cys = jnp.einsum("bql,lk->bqk", p.cy, p.lvl_onehot)
    ihws = jnp.einsum("bql,lk->bqk", p.ihw, p.lvl_onehot)
    ihhs = jnp.einsum("bql,lk->bqk", p.ihh, p.lvl_onehot)
    dx = (p.px[:, None, :] - cxs) * ihws
    dy = (p.py[:, None, :] - cys) * ihhs
    np.testing.assert_allclose(dx * dx + dy * dy, d2_ref,
                               rtol=1e-5, atol=1e-5)


def test_bf16_inputs(inputs):
    qh, kh, vh, key_bias, prior = inputs
    out = flash_mha(qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
                    vh.astype(jnp.bfloat16), key_bias, prior, 128, True)
    ref = dense_reference(qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
                          vh.astype(jnp.bfloat16), key_bias, prior)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_grads_flow(inputs):
    qh, kh, vh, key_bias, prior = inputs

    def loss_flash(q, k, v, g):
        pr = prior._replace(gamma=g)
        return flash_mha(q, k, v, key_bias, pr, 128, True).sum()

    def loss_ref(q, k, v, g):
        pr = prior._replace(gamma=g)
        return dense_reference(q, k, v, key_bias, pr).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(qh, kh, vh, prior.gamma)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qh, kh, vh, prior.gamma)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_multi_key_block_online_softmax():
    """S > BLOCK_K forces nk > 1 key blocks: exercises the online-softmax
    carry (running max/normalizer rescale across key-block grid steps)
    that the big-geometry (S~14k) path relies on. S=1200 pads to 1536 =
    3 x BLOCK_K(512), with the pad tail masked via the key bias."""
    from dtlr_tpu.ops.flash_attn import BLOCK_K

    S_big = 1200
    assert S_big + (-S_big % 128) > BLOCK_K  # really multi-block
    spatial = ((8, 100), (4, 50), (2, 50), (2, 50))  # sums to 1200
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    qh = _rand(ks[0], B, M, Q, D)
    kh = _rand(ks[1], B, M, S_big, D)
    vh = _rand(ks[2], B, M, S_big, D)
    key_bias = jnp.where(
        jax.random.uniform(ks[3], (B, S_big)) < 0.2, -1e9, 0.0
    ).astype(jnp.float32)
    ref = jax.random.uniform(ks[4], (B, Q, len(spatial), 4),
                             minval=0.05, maxval=0.9)
    prior = make_box_prior(ref, spatial, jnp.exp(_rand(ks[5], M) * 0.3))
    for pr in (None, prior):
        out = flash_mha(qh, kh, vh, key_bias, pr, 128, True)
        want = dense_reference(qh, kh, vh, key_bias, pr)
        np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_decoder_layer_flash_parity():
    """DecoderLayer with flash=True must match the materialized-score
    baseline on the eval path (same params: the flag changes execution,
    not parameterization)."""
    from dtlr_tpu.models.transformer import DecoderLayer

    d_model, n_heads, nq, s = 64, 4, 36, 200
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    tgt = _rand(ks[0], b, nq, d_model)
    qpos = _rand(ks[1], b, nq, d_model)
    memory = _rand(ks[2], b, s, d_model)
    mpos = _rand(ks[3], b, s, d_model)
    refs = jax.random.uniform(ks[4], (b, nq, len(SPATIAL), 4),
                              minval=0.05, maxval=0.9)
    pad = jax.random.uniform(ks[5], (b, s)) < 0.15

    def run(flash):
        layer = DecoderLayer(d_model=d_model, d_ffn=128, n_heads=n_heads,
                             ca_type="dense", box_bias=True, flash=flash)
        return layer, dict(
            tgt=tgt, query_pos=qpos, reference_points_input=refs,
            memory=memory, spatial_shapes=SPATIAL,
            memory_key_padding_mask=pad, memory_pos=mpos)

    base, kw = run(False)
    params = base.init(jax.random.PRNGKey(0), **kw)
    out_base = base.apply(params, **kw)
    fl, kw2 = run(True)
    out_flash = fl.apply(params, **kw2)
    np.testing.assert_allclose(out_flash, out_base, rtol=2e-4, atol=2e-4)
