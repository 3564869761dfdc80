"""Flax ResNet-34-8s: a dilated fully-convolutional ResNet with output
stride 8 and a 1x1 descriptor head, bilinearly upsampled to input resolution.

Behavioral rebuild of the reference backbone (the CoRL-2018 default,
``dense_correspondence_network.py:360-383, 408-412``, which delegates to the
pytorch-segmentation-detection ``Resnet34_8s``): a standard ResNet-34 whose
last two stages trade stride for dilation (x2 and x4), so the feature map
stays at 1/8 resolution, followed by a ``num_classes``-channel 1x1 conv and
bilinear upsampling back to the input size.

TPU-first details:
  * NHWC layout throughout (native for TPU convolutions)
  * optional bfloat16 compute with float32 params and batch stats
  * the upsample is ``jax.image.resize`` (XLA lowers this to efficient
    gather/matmul patterns); head + x8 resize measure ~4 ms of a 310 ms
    B=256 serving batch (tools/tpu_probe_stages.py), so no custom kernel
    is warranted there — the Pallas kernels live where the FLOPs/bytes
    are (:mod:`pdc_tpu.ops.pallas_kernels` best-match streaming argmin,
    :mod:`pdc_tpu.ops.pallas_loss` fused pooled-hinge)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class Int8Conv(nn.Conv):
    """``nn.Conv`` with an optional dynamically-quantized int8 path.

    With ``quant_int8=False`` (the default, and always during training) this
    IS ``nn.Conv`` — same parameter names/shapes, so checkpoints are
    interchangeable. With ``quant_int8=True`` the convolution runs s8 x s8 ->
    s32 on the MXU's 2x int8 path (v5e: ~394 int8 TOPS vs ~197 bf16 TFLOPS):

      * activations: per-tensor symmetric scale, computed dynamically from
        the batch max (no calibration pass needed; the abs-max reduction is
        one cheap pass over VMEM-resident tiles)
      * weights: per-output-channel symmetric scales (standard PTQ — keeps
        channel-to-channel magnitude spread out of the quantization error)
      * dequant + bias + everything downstream (BN, ReLU, residual adds)
        stay in the float compute dtype

    Quantization error is bounded by the 127-level grids; accuracy is
    validated in tests/test_quantized.py (descriptor cosine similarity and
    best-match agreement vs the float path).

    ``quant_static=True`` additionally replaces the per-call abs-max with a
    CALIBRATED per-layer activation scale stored in the ``quant_scales``
    variable collection: the abs-max reduction is a full extra HBM pass per
    layer that cannot fuse into the conv's producer (two-phase: reduce,
    then quantize) and costs ~20% of the int8 forward (1126 -> 1405 img/s
    measured at the headline shape, tools/tpu_probe_int8_static.py). Scales
    are populated by running forwards with ``mutable=["quant_scales"]``
    (max-accumulated across calibration batches;
    ``DCN.calibrate_quantization`` drives this).
    """

    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.quant_int8:
            return super().__call__(x)
        assert self.feature_group_count == 1, "int8 path: no grouped convs"
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)

        xf = x.astype(jnp.float32)
        if self.quant_static:
            s_var = self.variable("quant_scales", "act_scale",
                                  lambda: jnp.float32(0.0))
            if self.is_mutable_collection("quant_scales"):
                obs = jnp.max(jnp.abs(xf)) / 127.0  # calibration pass
                s_var.value = jnp.maximum(s_var.value, obs)
            s_x = jnp.maximum(s_var.value, 1e-8)
        else:
            s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)

        def _pair(v):
            if v is None:
                return (1, 1)
            return (v, v) if isinstance(v, int) else tuple(v)

        strides = _pair(self.strides)
        dilation = _pair(self.kernel_dilation)
        dn = lax.conv_dimension_numbers(x.shape, wq.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xq, wq, strides, self.padding, rhs_dilation=dilation,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(self.dtype or x.dtype)


class BasicBlock(nn.Module):
    """ResNet v1 basic block with optional dilation (used by stages 3/4)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = (x.shape[-1] != self.features) or self.stride != 1
        residual = x

        y = Int8Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv1",
            quant_int8=self.quant_int8, quant_static=self.quant_static,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Int8Conv(
            self.features, (3, 3), strides=(1, 1),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2",
            quant_int8=self.quant_int8, quant_static=self.quant_static,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)

        if needs_proj:
            residual = Int8Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="proj_conv",
                quant_int8=self.quant_int8, quant_static=self.quant_static,
            )(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype, name="proj_bn")(residual)

        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """ResNet v1.5 bottleneck (1x1 reduce -> 3x3 stride/dilation -> 1x1
    expand x4), dilation on the 3x3 as in the dilated-FCN construction the
    reference's backbone library uses for its deeper variants."""

    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = 4 * self.features
        needs_proj = (x.shape[-1] != out_features) or self.stride != 1
        residual = x

        y = Int8Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                     name="conv1", quant_int8=self.quant_int8, quant_static=self.quant_static)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Int8Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2",
            quant_int8=self.quant_int8, quant_static=self.quant_static,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = Int8Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype,
                     name="conv3", quant_int8=self.quant_int8, quant_static=self.quant_static)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn3")(y)

        if needs_proj:
            residual = Int8Conv(
                out_features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="proj_conv",
                quant_int8=self.quant_int8, quant_static=self.quant_static,
            )(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype, name="proj_bn")(residual)

        return nn.relu(y + residual)


def space_to_batch(x, d: int):
    """[B, H, W, C] -> [d*d*B, H/d, W/d, C]: partition pixels by residue mod
    ``d``. A 3x3 conv with dilation ``d`` and padding ``d`` on the original
    equals a DENSE 3x3 conv with padding 1 on every subgrid — the classic
    atrous-conv space-to-batch identity (exact, incl. zero-padding)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = x.transpose(2, 4, 0, 1, 3, 5)  # [d, d, b, H/d, W/d, c]
    return x.reshape(d * d * b, h // d, w // d, c)


def batch_to_space(x, d: int, b: int):
    """Inverse of :func:`space_to_batch`."""
    _, h, w, c = x.shape
    x = x.reshape(d, d, b, h, w, c)
    x = x.transpose(2, 3, 0, 4, 1, 5)  # [b, h, d, w, d, c]
    return x.reshape(b, h * d, w * d, c)


class ResNetFCN(nn.Module):
    """Dilated ResNet FCN. ``output_stride`` of 8 dilates stages 3 and 4.

    ``stage_sizes=(3, 4, 6, 3)`` is ResNet-34; (2, 2, 2, 2) is ResNet-18.
    ``dtype=jnp.bfloat16`` runs conv/BN compute in bf16 with fp32 params;
    ``remat=True`` rematerializes each residual block in the backward pass
    (activation memory ~ one block instead of the whole network).

    ``dilated_s2b=True`` runs the dilated stages in SPACE-TO-BATCH layout:
    the stage-entry transform turns every dilated 3x3 into a dense 3x3 on
    d^2 independent subgrids (amortized once per stage, undone before the
    head's upsample). Numerically exact — same parameters, same output
    (residue partition + identical BN statistics; tests/test_models.py
    asserts equality) — but the backward's dgrad/wgrad become standard
    convolutions, which tile better on the MXU (the per-stage fwd+bwd probe
    measured the dilated backward at 74-78% of peak vs 90-94% forward).
    Requires H/8 and W/8 divisible by 4 (all reference resolutions are).
    """

    num_classes: int
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 8
    dtype: Any = jnp.float32
    remat: bool = False
    bottleneck: bool = False  # BottleneckBlock (ResNet-50/101) vs BasicBlock
    dilated_s2b: bool = False
    # int8 PTQ serving path (inference only — round() has zero gradient, so
    # train=True always runs the float convs); quant_static additionally uses
    # calibrated activation scales from the quant_scales collection
    quant_int8: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_h, in_w = x.shape[1], x.shape[2]
        batch = x.shape[0]
        x = x.astype(self.dtype)
        quant = self.quant_int8 and not train

        x = Int8Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     use_bias=False, dtype=self.dtype, name="stem_conv",
                     quant_int8=quant, quant_static=self.quant_static)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        if self.output_stride == 8:
            stage_strides = (1, 2, 1, 1)
            stage_dilations = (1, 1, 2, 4)
        elif self.output_stride == 16:
            stage_strides = (1, 2, 2, 1)
            stage_dilations = (1, 1, 1, 2)
        else:  # classification-style, stride 32
            stage_strides = (1, 2, 2, 2)
            stage_dilations = (1, 1, 1, 1)

        use_s2b = self.dilated_s2b and self.output_stride == 8
        if use_s2b:
            if (in_h // 8) % 4 or (in_w // 8) % 4:
                raise ValueError(
                    f"dilated_s2b needs H/8 and W/8 divisible by 4, got "
                    f"input {in_h}x{in_w}")
            stage_dilations = (1, 1, 1, 1)  # dense convs in s2b layout

        base_cls = BottleneckBlock if self.bottleneck else BasicBlock
        block_cls = nn.remat(base_cls, static_argnums=(2,)) if self.remat else base_cls
        features = (64, 128, 256, 512)
        s2b_factor = 1
        for stage, (blocks, feats) in enumerate(zip(self.stage_sizes, features)):
            if use_s2b and stage >= 2:
                # entering a dilated stage: one more 2x subgrid split (the
                # cascade realizes dilation 2 then 4 relative to the input)
                x = space_to_batch(x, 2)
                s2b_factor *= 2
            for block in range(blocks):
                x = block_cls(
                    features=feats,
                    stride=stage_strides[stage] if block == 0 else 1,
                    dilation=stage_dilations[stage],
                    dtype=self.dtype,
                    quant_int8=quant, quant_static=self.quant_static,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)

        # 1x1 descriptor head (the reference's ``score_32s``-style head
        # collapsed to the single stride-8 head Resnet34_8s actually uses)
        x = Int8Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head",
                     quant_int8=quant, quant_static=self.quant_static)(x)

        if use_s2b:
            # undo the cascade (inner split first)
            x = batch_to_space(x, 2, 2 * 2 * batch)
            x = batch_to_space(x, 2, batch)

        # Bilinear upsample back to input resolution (align_corners=False
        # semantics via jax.image.resize 'linear'), in the compute dtype.
        # The [B, H, W, D] output write is the dominant HBM traffic of the
        # inference path; upcasting before (or fused after) the resize doubles
        # it for no accuracy gain, so the descriptor image is returned in the
        # compute dtype and consumers upcast where they accumulate.
        return _resize_bilinear(x, in_h, in_w)


def _resize_bilinear(x, h, w):
    import jax

    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="linear")


def ResNet34_8s(num_classes: int, dtype=jnp.float32, remat: bool = False,
                dilated_s2b: bool = False) -> ResNetFCN:
    """The CoRL-2018 default backbone."""
    return ResNetFCN(num_classes=num_classes, stage_sizes=(3, 4, 6, 3),
                     output_stride=8, dtype=dtype, remat=remat,
                     dilated_s2b=dilated_s2b)


def ResNet18_8s(num_classes: int, dtype=jnp.float32, remat: bool = False,
                dilated_s2b: bool = False) -> ResNetFCN:
    return ResNetFCN(num_classes=num_classes, stage_sizes=(2, 2, 2, 2),
                     output_stride=8, dtype=dtype, remat=remat,
                     dilated_s2b=dilated_s2b)


def ResNet50_8s(num_classes: int, dtype=jnp.float32, remat: bool = False,
                dilated_s2b: bool = False) -> ResNetFCN:
    return ResNetFCN(num_classes=num_classes, stage_sizes=(3, 4, 6, 3),
                     output_stride=8, dtype=dtype, remat=remat,
                     bottleneck=True, dilated_s2b=dilated_s2b)


def ResNet101_8s(num_classes: int, dtype=jnp.float32, remat: bool = False,
                 dilated_s2b: bool = False) -> ResNetFCN:
    """The deeper variant the reference's backbone library also offers
    (pytorch-segmentation-detection Resnet101_8s)."""
    return ResNetFCN(num_classes=num_classes, stage_sizes=(3, 4, 23, 3),
                     output_stride=8, dtype=dtype, remat=remat,
                     bottleneck=True, dilated_s2b=dilated_s2b)
