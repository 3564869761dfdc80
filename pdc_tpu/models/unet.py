"""Flax UNet backbone — the reference's alternative FCN
(``dense_correspondence_network.py:347-356`` delegates to external/unet-pytorch;
classic 4-level encoder/decoder with skip connections)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdc_tpu.models.resnet import Int8Conv


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32
    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = Int8Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                         dtype=self.dtype, name=f"conv{i}",
                         quant_int8=self.quant_int8,
                         quant_static=self.quant_static)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    num_classes: int
    base_features: int = 64
    dtype: Any = jnp.float32
    # int8 PTQ serving convs (inference only; see resnet.Int8Conv);
    # quant_static uses calibrated activation scales (quant_scales collection)
    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        quant = self.quant_int8 and not train
        f = self.base_features
        skips = []
        for level in range(4):
            x = DoubleConv(f * (2**level), dtype=self.dtype, quant_int8=quant, quant_static=self.quant_static,
                           name=f"down{level}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(f * 16, dtype=self.dtype, quant_int8=quant, quant_static=self.quant_static,
                       name="bottleneck")(x, train)

        for level in reversed(range(4)):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="linear")
            x = Int8Conv(f * (2**level), (1, 1), dtype=self.dtype,
                         name=f"up_proj{level}", quant_int8=quant, quant_static=self.quant_static)(x)
            skip = skips[level]
            # crop-free concat: shapes match for inputs divisible by 16
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(f * (2**level), dtype=self.dtype,
                           quant_int8=quant, quant_static=self.quant_static, name=f"up{level}")(x, train)

        x = Int8Conv(self.num_classes, (1, 1), dtype=self.dtype,
                     name="head", quant_int8=quant, quant_static=self.quant_static)(x)
        return x.astype(jnp.float32)
