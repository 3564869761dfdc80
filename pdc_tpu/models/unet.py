"""Flax UNet backbone — the reference's alternative FCN
(``dense_correspondence_network.py:347-356`` delegates to external/unet-pytorch;
classic 4-level encoder/decoder with skip connections)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    num_classes: int
    base_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        f = self.base_features
        skips = []
        for level in range(4):
            x = DoubleConv(f * (2**level), dtype=self.dtype, name=f"down{level}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(f * 16, dtype=self.dtype, name="bottleneck")(x, train)

        for level in reversed(range(4)):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="linear")
            x = nn.Conv(f * (2**level), (1, 1), dtype=self.dtype,
                        name=f"up_proj{level}")(x)
            skip = skips[level]
            # crop-free concat: shapes match for inputs divisible by 16
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(f * (2**level), dtype=self.dtype, name=f"up{level}")(x, train)

        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)
