"""ConvNeXt backbone (optional, reference models/dino/convnext.py:55-251,
selected via args.backbone='convnext_xlarge_22k')."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + y * gamma.astype(y.dtype)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (256, 512, 1024, 2048)  # xlarge
    return_indices: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for st, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if st == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = nn.LayerNorm(dtype=jnp.float32, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(dtype=jnp.float32, name=f"down_norm{st}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_conv{st}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage{st}_block{b}")(x)
            outs.append(nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{st}")(x))
        return tuple(outs[i] for i in self.return_indices)


CONVNEXT_CONFIGS = {
    "convnext_xlarge_22k": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
    "convnext_large_22k": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_base_22k": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
}


def build_convnext(name: str, return_indices=(1, 2, 3), dtype=jnp.float32):
    if name not in CONVNEXT_CONFIGS:
        raise ValueError(f"unknown convnext variant {name!r}")
    cfg = CONVNEXT_CONFIGS[name]
    model = ConvNeXt(return_indices=tuple(return_indices), dtype=dtype, **cfg)
    num_channels = [cfg["dims"][i] for i in return_indices]
    return model, num_channels
