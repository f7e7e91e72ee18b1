import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.models.layers import MSDeformAttn
from dtlr_tpu.ops.deform_attn import deform_attn_xla, deform_attn_xla_shared


def test_shared_op_matches_per_head_when_locations_tied():
    """If per-head locations happen to be identical, the shared op must
    produce the same output as the per-head op."""
    rng = np.random.default_rng(0)
    B, Lq, M, D, L, P = 2, 10, 4, 8, 2, 3
    shapes = ((5, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    C = M * D
    value = rng.standard_normal((B, S, C)).astype(np.float32)
    loc1 = rng.uniform(0, 1, (B, Lq, 1, L, P, 2)).astype(np.float32)
    loc = np.broadcast_to(loc1, (B, Lq, M, L, P, 2)).copy()
    attn = rng.random((B, Lq, M, L, P)).astype(np.float32)
    attn /= attn.sum((-2, -1), keepdims=True)

    per_head = np.asarray(
        deform_attn_xla(value.reshape(B, S, M, D), shapes, loc, attn)
    )
    shared = np.asarray(
        deform_attn_xla_shared(value, shapes, loc1[:, :, 0], attn, n_heads=M)
    )
    np.testing.assert_allclose(shared, per_head, atol=1e-5, rtol=1e-5)


def test_module_shared_offsets_forward():
    model = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2,
                         shared_offsets=True)
    rng = jax.random.PRNGKey(0)
    B, Lq = 2, 6
    shapes = ((4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)
    q = jax.random.normal(rng, (B, Lq, 32))
    ref = jax.random.uniform(rng, (B, Lq, 2, 4))
    src = jax.random.normal(rng, (B, S, 32))
    params = model.init(rng, q, ref, src, shapes)
    out = model.apply(params, q, ref, src, shapes)
    assert out.shape == (B, Lq, 32)
    assert np.isfinite(np.asarray(out)).all()
    # offsets head has 1 group instead of n_heads
    k = params["params"]["sampling_offsets"]["kernel"]
    assert k.shape == (32, 1 * 2 * 2 * 2)
