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
