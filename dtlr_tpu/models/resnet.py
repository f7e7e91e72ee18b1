"""ResNet backbone (flax.linen, NHWC) with frozen-norm semantics.

Mirrors the behavioral contract of the reference backbone (reference
models/dino/backbone.py:36-128): torchvision ResNet-50/101 with
FrozenBatchNorm2d, returning feature maps from layer1/2/3 (strides
8/16/32), plus a per-level downsampled padding mask.

TPU-first deviations:
- NHWC layout (XLA TPU native) instead of NCHW.
- ``norm`` is configurable: "frozen_bn" reproduces FrozenBatchNorm2d
  (y = (x - mean) / sqrt(var + eps) * weight + bias with all four as
  non-trainable constants, exactly torch's frozen module), while
  "group" uses GroupNorm(32) — the idiomatic choice when training from
  scratch on TPU where no ImageNet running stats exist.
- The stride-2 3x3 convs live in the 3x3 position (torchvision v1.5+
  "ResNet B" convention, same as torchvision resnet50).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant statistics and affine params.

    Parameters live in the ``frozen`` param collection-like scope (still
    ordinary params, but callers exclude ``.../frozen_bn/...`` from the
    optimizer — see train/optim.py) so torch checkpoints can be imported
    directly (reference models/dino/backbone.py:36-72).
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        w = scale / jnp.sqrt(var + self.eps)
        b = bias - mean * w
        return (x.astype(jnp.float32) * w + b).astype(x.dtype)


def make_norm(kind: str, features: int, dtype=jnp.float32):
    if kind == "FrozenBatchNorm2d" or kind == "frozen_bn":
        return FrozenBatchNorm(features, name=None, dtype=dtype)
    if kind == "group":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype)
    raise ValueError(f"unknown norm kind {kind!r}")


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    norm_kind: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        needs_proj = x.shape[-1] != self.features * 4 or self.stride != 1

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = make_norm(self.norm_kind, self.features)(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = make_norm(self.norm_kind, self.features)(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = make_norm(self.norm_kind, self.features * 4)(y)

        if needs_proj:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride), name="downsample")(x)
            residual = make_norm(self.norm_kind, self.features * 4)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning {layer1(out s4)...layer4} features.

    ``return_indices`` selects which stages to return, matching the
    reference's return_interm_indices=[1,2,3] (strides 8, 16, 32;
    reference models/dino/backbone.py:75-106).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    width: int = 64
    norm_kind: str = "frozen_bn"
    return_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        y = conv(self.width, (7, 7), strides=(2, 2),
                 padding=[(3, 3), (3, 3)], name="conv1")(x)
        y = make_norm(self.norm_kind, self.width)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = []
        for stage, blocks in enumerate(self.stage_sizes):
            feats = self.width * (2 ** stage)
            for blk in range(blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                y = Bottleneck(feats, stride=stride, norm_kind=self.norm_kind,
                               dtype=self.dtype, name=f"layer{stage + 1}_{blk}")(y)
            outputs.append(y)
        return tuple(outputs[i] for i in self.return_indices)


RESNET_CHANNELS = {  # output channels of layers 0..3 (x4 expansion)
    "resnet50": (256, 512, 1024, 2048),
    "resnet101": (256, 512, 1024, 2048),
}

RESNET_STAGES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


def build_resnet(name: str, norm_kind: str, return_indices=(1, 2, 3), dtype=jnp.float32):
    if name not in RESNET_STAGES:
        raise ValueError(f"unsupported backbone {name!r}")
    num_channels = [RESNET_CHANNELS[name][i] for i in return_indices]
    model = ResNet(
        stage_sizes=RESNET_STAGES[name],
        norm_kind=norm_kind,
        return_indices=tuple(return_indices),
        dtype=dtype,
    )
    return model, num_channels
