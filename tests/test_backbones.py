import jax
import jax.numpy as jnp
import pytest

from dtlr_tpu.models.convnext import build_convnext
from dtlr_tpu.models.resnet import build_resnet
from dtlr_tpu.models.swin import build_swin


@pytest.mark.parametrize("builder,name,chans", [
    (build_resnet, "resnet50", [512, 1024, 2048]),
    (build_swin, "swin_T_224_1k", [192, 384, 768]),
    (build_convnext, "convnext_tiny", [192, 384, 768]),
])
def test_backbone_shapes(builder, name, chans):
    if builder is build_resnet:
        model, num_channels = builder(name, "group")
    else:
        model, num_channels = builder(name)
    assert num_channels == chans
    x = jnp.zeros((1, 64, 96, 3))
    init = jax.jit(lambda r: model.init(r, x))
    params = init(jax.random.PRNGKey(0))
    feats = jax.jit(lambda p: model.apply(p, x))(params)
    assert len(feats) == 3
    # strides 8, 16, 32
    for f, s, c in zip(feats, (8, 16, 32), chans):
        assert f.shape == (1, 64 // s, 96 // s, c), f.shape
