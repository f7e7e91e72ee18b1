"""The quad-packed single-gather formulation must match the plain
4-gather formulation exactly (both vs the torch oracle indirectly via
test_deform_attn.py)."""

import jax
import numpy as np

from dtlr_tpu.ops.deform_attn import deform_attn_xla


def make_inputs(rng, B=2, M=4, D=16, Lq=24, P=3, shapes=((6, 10), (3, 5))):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, (B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.random((B, Lq, M, L, P)).astype(np.float32) + 1e-3
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    return value, loc, attn, shapes


def test_packed_matches_plain():
    rng = np.random.default_rng(0)
    value, loc, attn, shapes = make_inputs(rng)
    plain = np.asarray(deform_attn_xla(value, shapes, loc, attn, packed=False))
    packed = np.asarray(deform_attn_xla(value, shapes, loc, attn, packed=True))
    np.testing.assert_allclose(packed, plain, atol=1e-5, rtol=1e-5)


def test_packed_boundaries():
    # all samples at/over the borders: packed wrap addressing must still
    # zero out invalid corners exactly
    rng = np.random.default_rng(1)
    value, loc, attn, shapes = make_inputs(rng, Lq=16, P=2)
    loc = np.stack(np.meshgrid(
        np.asarray([-0.05, 0.0, 0.999, 1.05]),
        np.asarray([-0.05, 0.0, 0.999, 1.05]),
    ), -1).reshape(1, 16, 1, 1, 1, 2)
    loc = np.broadcast_to(loc, (2, 16, 4, 2, 2, 2)).astype(np.float32).copy()
    plain = np.asarray(deform_attn_xla(value, shapes, loc, attn, packed=False))
    packed = np.asarray(deform_attn_xla(value, shapes, loc, attn, packed=True))
    np.testing.assert_allclose(packed, plain, atol=1e-5, rtol=1e-5)


def test_packed_gradients_match():
    rng = np.random.default_rng(2)
    value, loc, attn, shapes = make_inputs(rng, B=1, M=2, D=8, Lq=6, P=2)

    def loss(packed):
        return lambda v, l, a: (deform_attn_xla(v, shapes, l, a, packed=packed) ** 2).sum()

    g_plain = jax.grad(loss(False), argnums=(0, 1, 2))(value, loc, attn)
    g_packed = jax.grad(loss(True), argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_plain, g_packed):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)
