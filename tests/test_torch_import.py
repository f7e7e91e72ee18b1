"""Round-trip test of the torch<->flax weight mapping: export our params
under reference torch names, re-import into a zeroed tree, expect exact
equality (validates name coverage and layout conversions both ways)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtlr_tpu.models.dino import DINO
from dtlr_tpu.train.torch_import import export_torch_state, import_torch_state


@pytest.fixture(scope="module")
def tiny_params():
    model = DINO(
        num_classes=11, num_queries=20, hidden_dim=64, n_heads=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=96,
        num_feature_levels=4, use_dn=False, dn_labelbook_size=12,
        max_targets=4, norm_kind="frozen_bn",
    )
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 96, 3))
    vhw = jnp.asarray([[64, 96]], jnp.int32)
    init = jax.jit(lambda r: model.init({"params": r}, imgs, vhw, None, train=False))
    return init(rng)


def test_roundtrip_exact(tiny_params):
    sd = export_torch_state(tiny_params, n_heads=4, d_model=64)
    # a few canonical reference names must exist
    for name in (
        "backbone.0.body.conv1.weight",
        "backbone.0.body.layer1.0.downsample.1.running_var",
        "transformer.encoder.layers.0.self_attn.sampling_offsets.weight",
        "transformer.decoder.layers.1.self_attn.in_proj_weight",
        "class_embed.0.bias",
        "bbox_embed.1.layers.2.weight",
        "label_enc.weight",
        "input_proj.3.0.weight",
    ):
        assert name in sd, name
    assert sd["transformer.decoder.layers.1.self_attn.in_proj_weight"].shape == (192, 64)

    zeroed = jax.tree.map(jnp.zeros_like, tiny_params)
    restored, missing, unmapped = import_torch_state(zeroed, sd, n_heads=4, d_model=64)
    assert not missing
    a = jax.tree.leaves(tiny_params)
    b = jax.tree.leaves(jax.tree.map(jnp.asarray, restored))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_unmapped_count_is_zero(tiny_params):
    sd = export_torch_state(tiny_params, n_heads=4, d_model=64)
    _, _, unmapped = import_torch_state(
        jax.tree.map(jnp.zeros_like, tiny_params), sd, n_heads=4, d_model=64
    )
    assert unmapped == 0, f"{unmapped} flax leaves not covered by the torch mapping"
