"""Box-locality log-prior for the dense decoder cross-attention
(`dense_box_bias=True`).

Injects deformable attention's box-guided locality prior (reference
models/dino/deformable_transformer.py decoder CA samples around the
query's reference box) into the MXU-native dense Q x S attention as an
additive pre-softmax Gaussian bias with per-head learnable sharpness.
gamma -> 0 must recover plain dense CA exactly (warm-start safety), and
the distance field must be computed in the same padded-frame fractions
the deformable sampler uses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.models.dino import DINO
from dtlr_tpu.models.transformer import dense_box_prior_d2


def tiny_model(box_bias: bool) -> DINO:
    return DINO(
        num_classes=12, num_queries=20, hidden_dim=32, n_heads=4,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
        num_feature_levels=4, use_dn=True, dn_number=3,
        dn_labelbook_size=13, max_targets=6, norm_kind="frozen_bn",
        shared_offsets=True, encoder_type="windowed", encoder_win=8,
        decoder_ca="dense", dense_box_bias=box_bias, dtype=jnp.float32,
    )


def init_params(model, images, valid_hw):
    rng = jax.random.PRNGKey(1)
    return jax.jit(
        lambda r, im, vh: model.init({"params": r}, im, vh, None, train=False)
    )(rng, images, valid_hw)


def make_batch():
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (2, 32, 64, 3))
    valid_hw = jnp.asarray([[32, 64], [24, 50]], jnp.int32)
    return images, valid_hw


def test_d2_matches_numpy_loop():
    """(B, nq, S) squared distances, box-half-extent normalized, per level."""
    rng = np.random.default_rng(0)
    B, nq = 2, 3
    shapes = ((4, 6), (2, 3))
    ref = rng.uniform(0.1, 0.9, size=(B, nq, len(shapes), 4)).astype(np.float32)
    got = np.asarray(dense_box_prior_d2(jnp.asarray(ref), shapes))
    want = []
    for lvl, (h, w) in enumerate(shapes):
        lv = np.zeros((B, nq, h * w), np.float32)
        for b in range(B):
            for q in range(nq):
                cx, cy, bw, bh = ref[b, q, lvl]
                for i in range(h):
                    for j in range(w):
                        dx = ((j + 0.5) / w - cx) / max(bw / 2, 1e-3)
                        dy = ((i + 0.5) / h - cy) / max(bh / 2, 1e-3)
                        lv[b, q, i * w + j] = dx * dx + dy * dy
        want.append(lv)
    np.testing.assert_allclose(got, np.concatenate(want, axis=-1), rtol=1e-5)
    # a pixel at the box center scores ~0; the box corner scores ~2
    center = dense_box_prior_d2(
        jnp.asarray([[[ [3.5 / 6, 1.5 / 4, 0.3, 0.4] ]]], jnp.float32), ((4, 6),)
    )
    assert float(center[0, 0, 1 * 6 + 3]) < 1e-6


def test_gamma_zero_recovers_plain_dense():
    """exp(-inf)=0 bias must reproduce the no-bias model exactly (flax
    derives per-param init rngs from the path, so shared leaves of the
    two inits are identical)."""
    images, valid_hw = make_batch()
    m_off, m_on = tiny_model(False), tiny_model(True)
    p_off, p_on = init_params(m_off, images, valid_hw), init_params(m_on, images, valid_hw)

    p_on_zero = jax.tree_util.tree_map_with_path(
        lambda k, v: jnp.full_like(v, -100.0)
        if "ca_box_gamma" in jax.tree_util.keystr(k) else v,
        p_on,
    )
    out_off = m_off.apply(p_off, images, valid_hw, None, train=False)
    out_on = m_on.apply(p_on_zero, images, valid_hw, None, train=False)
    np.testing.assert_allclose(
        np.asarray(out_off["pred_logits"]), np.asarray(out_on["pred_logits"]),
        rtol=1e-6, atol=1e-6,
    )


def test_bias_active_and_trainable():
    images, valid_hw = make_batch()
    model = tiny_model(True)
    params = init_params(model, images, valid_hw)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    gammas = [k for k, _ in flat if "ca_box_gamma" in jax.tree_util.keystr(k)]
    assert len(gammas) == 2  # one per decoder layer

    out = model.apply(params, images, valid_hw, None, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()

    # at init (gamma=1) the prior is live: outputs differ from gamma->0
    params_zero = jax.tree_util.tree_map_with_path(
        lambda k, v: jnp.full_like(v, -100.0)
        if "ca_box_gamma" in jax.tree_util.keystr(k) else v,
        params,
    )
    out_zero = model.apply(params_zero, images, valid_hw, None, train=False)
    assert np.abs(np.asarray(out["pred_logits"] - out_zero["pred_logits"])).max() > 1e-4

    def loss(p):
        o = model.apply(p, images, valid_hw, None, train=False)
        return (o["pred_logits"] ** 2).mean()

    grads = jax.grad(loss)(params)
    gflat = jax.tree_util.tree_flatten_with_path(grads)[0]
    gnorm = [np.abs(np.asarray(v)).max() for k, v in gflat
             if "ca_box_gamma" in jax.tree_util.keystr(k)]
    assert gnorm and max(gnorm) > 0.0
