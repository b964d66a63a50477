"""ResNet-18 with GroupNorm — the alternative vision encoder.

Parity with `VisionEncoder()` (`/root/reference/models/Unet_FiLmLayer.py:
316-386`): torchvision resnet18 with the final fc removed (512-d output) and
every BatchNorm replaced by GroupNorm(features/16 groups) — the
diffusion-policy recipe.  Implemented natively in Flax/NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _gn(features: int) -> nn.Module:
    return nn.GroupNorm(num_groups=max(1, features // 16))


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False)(x)
        y = _gn(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = _gn(self.features)(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False)(x)
            residual = _gn(self.features)(residual)
        return nn.relu(y + residual)


class ResNet18GN(nn.Module):
    """(B, H, W, 3) -> (B, 512)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)(x)
        x = _gn(64)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            for b in range(blocks):
                strides = 2 if i > 0 and b == 0 else 1
                x = BasicBlock(features, strides)(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 512)
