import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.models.windowed_encoder import WindowedEncoderLayer
from dtlr_tpu.models.dino import DINO


def test_windowed_layer_shapes_and_masking():
    shapes = ((8, 40), (4, 20), (2, 10), (1, 5))
    S = sum(h * w for h, w in shapes)
    B, C = 2, 64
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (B, S, C))
    pos = jax.random.normal(rng, (B, S, C))
    mask = jnp.zeros((B, S), bool)
    layer = WindowedEncoderLayer(d_model=C, d_ffn=128, n_heads=4, win=16, shift=True)
    params = layer.init(rng, src, pos, shapes, mask)
    out = layer.apply(params, src, pos, shapes, mask)
    assert out.shape == (B, S, C)
    assert np.isfinite(np.asarray(out)).all()


def test_windowed_dino_forward():
    model = DINO(
        num_classes=12, num_queries=24, hidden_dim=64, n_heads=4,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=96,
        num_feature_levels=4, use_dn=False, dn_labelbook_size=13,
        max_targets=4, norm_kind="group", encoder_type="windowed",
        encoder_win=8,
    )
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 128, 3))
    vhw = jnp.asarray([[64, 100]], jnp.int32)
    init = jax.jit(lambda r: model.init({"params": r}, imgs, vhw, None, train=False))
    params = init(rng)
    out = jax.jit(lambda p: model.apply(p, imgs, vhw, None, train=False))(params)
    assert out["pred_logits"].shape == (1, 24, 12)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
