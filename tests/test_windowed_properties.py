"""Property tests for the windowed encoder: shifted windows propagate
information across window boundaries over two layers, and padding
columns cannot influence valid outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.models.windowed_encoder import WindowedEncoderLayer


def _setup(win=8, W=32, H=4, C=32, shift=False, seed=0):
    shapes = ((H, W),)
    S = H * W
    rng = jax.random.PRNGKey(seed)
    src = jax.random.normal(rng, (1, S, C))
    pos = jnp.zeros((1, S, C))
    mask = jnp.zeros((1, S), bool)
    layer = WindowedEncoderLayer(d_model=C, d_ffn=64, n_heads=4, n_levels=1,
                                 win=win, shift=shift)
    params = layer.init(rng, src, pos, shapes, mask)
    return layer, params, src, pos, shapes, mask


def test_no_shift_locality():
    """Without shift, perturbing column 0 must not affect the last
    window's outputs (windows are independent)."""
    layer, params, src, pos, shapes, mask = _setup(shift=False)
    H, W, C = 4, 32, 32
    out1 = layer.apply(params, src, pos, shapes, mask)
    src2 = src.at[:, 0, :].add(10.0)  # (row 0, col 0) in window 0
    out2 = layer.apply(params, src2, pos, shapes, mask)
    d = np.abs(np.asarray(out2 - out1)).reshape(H, W, C)
    # cross-level mix is zero-init, so window 3 (cols 24..31) unchanged
    assert d[:, 24:, :].max() < 1e-5
    assert d[:, :8, :].max() > 1e-3  # own window changed


def test_shifted_window_crosses_boundary():
    """With shift=True, information crosses the static window boundary."""
    layer, params, src, pos, shapes, mask = _setup(shift=True)
    H, W, C = 4, 32, 32
    out1 = layer.apply(params, src, pos, shapes, mask)
    src2 = src.at[:, 7, :].add(10.0)  # col 7, near boundary of window 0/1
    out2 = layer.apply(params, src2, pos, shapes, mask)
    d = np.abs(np.asarray(out2 - out1)).reshape(H, W, C)
    # shifted window [4..11] couples cols 8..11 with col 7
    assert d[:, 8:12, :].max() > 1e-4


def test_padding_isolated():
    """Keys in padded columns must not change valid outputs."""
    layer, params, src, pos, shapes, mask = _setup(shift=False)
    H, W, C = 4, 32, 32
    mask2 = np.zeros((1, H, W), bool)
    mask2[:, :, 28:] = True  # last 4 columns are padding
    mask2 = jnp.asarray(mask2.reshape(1, H * W))
    out1 = layer.apply(params, src, pos, shapes, mask2)
    # change padded content wildly
    src_np = np.array(src).reshape(1, H, W, C)
    src_np[:, :, 28:, :] += 100.0
    src2 = jnp.asarray(src_np.reshape(1, H * W, C))
    out2 = layer.apply(params, src2, pos, shapes, mask2)
    d = np.abs(np.asarray(out2 - out1)).reshape(H, W, C)
    assert d[:, :24, :].max() < 1e-4  # windows 0..2 untouched


def test_shifted_window_mask_blocks_wraparound():
    """Tokens wrapped from the other end of the line by the Swin-style
    roll must not attend across the segment boundary: perturbing the
    START of the line must not change a shifted layer's output at the
    far END beyond the shift reach (win columns)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtlr_tpu.models.windowed_encoder import WindowedEncoderLayer

    layer = WindowedEncoderLayer(d_model=32, d_ffn=64, n_heads=4, win=8,
                                 shift=True)
    h, w = 2, 40
    spatial = ((h, w),)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(1, h * w, 32)), jnp.float32)
    pos = jnp.zeros_like(src)
    mask = jnp.zeros((1, h * w), bool)
    params = layer.init(jax.random.PRNGKey(0), src, pos, spatial, mask)

    # perturb column 0 (both rows)
    src2 = src.at[:, 0:1].add(10.0).at[:, w : w + 1].add(10.0)
    y1 = layer.apply(params, src, pos, spatial, mask)
    y2 = layer.apply(params, src2, pos, spatial, mask)
    diff = np.abs(np.asarray(y1 - y2)).reshape(h, w, 32).max(axis=(0, 2))
    # without the mask, the wrapped window (last win//2 columns) sees
    # column 0 directly; with it, the far end must be untouched
    assert diff[0] > 0
    assert np.all(diff[w - 4 :] < 1e-5), diff[w - 8 :]


def test_migrate_windowed_qkv_exact():
    """Slicing an old fused-qkv checkpoint into qk + v_proj reproduces
    the old layer function exactly (old: q,k = qkv(x+p)[0:2],
    v = qkv(x)[2])."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtlr_tpu.models.windowed_encoder import WindowedEncoderLayer
    from dtlr_tpu.train.checkpoints import migrate_windowed_qkv

    layer = WindowedEncoderLayer(d_model=32, d_ffn=64, n_heads=4, win=8)
    h, w = 2, 16
    spatial = ((h, w),)
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(1, h * w, 32)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, h * w, 32)), jnp.float32)
    mask = jnp.zeros((1, h * w), bool)
    params = layer.init(jax.random.PRNGKey(0), src, pos, spatial, mask)

    # fabricate an "old" checkpoint with a fused qkv and migrate it
    p = params["params"]
    qk_k, qk_b = p["qk"]["kernel"], p["qk"]["bias"]
    v_k, v_b = p["v_proj"]["kernel"], p["v_proj"]["bias"]
    fused = {
        "kernel": jnp.concatenate([qk_k, v_k[:, None, :]], axis=1),
        "bias": jnp.concatenate([qk_b, v_b[None]], axis=0),
    }
    old = {k: v for k, v in p.items() if k not in ("qk", "v_proj")}
    old["qkv"] = fused
    migrated = migrate_windowed_qkv({"params": old})

    y_ref = layer.apply(params, src, pos, spatial, mask)
    y_mig = layer.apply(migrated, src, pos, spatial, mask)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_mig),
                               rtol=1e-6, atol=1e-6)
