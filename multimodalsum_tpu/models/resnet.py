"""Flax ResNet image encoder (reference ``src/img_encoder.py:4-41``).

A torchvision-compatible ResNet-50/101 / ResNeXt / wide-ResNet trunk
truncated at stage 3 (1/16 resolution, 1024 channels → 14x14 = 196 "pixel"
entities per 224x224 image) followed by a bias-free projection to
``d_model``. Matching the reference:

* gradients are stopped after stage 2 so only ``layer3`` (+ optional
  ``layer4``) and the projection train (reference ``:32-33``:
  ``self.stage2(x).detach()``);
* BatchNorm uses batch statistics in training (torch train mode) and the
  running averages at eval; running stats live in the ``batch_stats``
  collection and are updated even for the frozen stages, as torch does.

TPU-native differences: NHWC layout end-to-end (the data layer emits NHWC
directly; the weight converter in ``ckpt/convert.py`` transposes torchvision
NCHW kernels), and XLA fuses conv+BN+ReLU without a hand-written kernel.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # torch BatchNorm2d momentum=0.1 -> flax momentum = 1-0.1


def _conv(features, kernel, stride=1, name=None, groups=1):
    from multimodalsum_tpu.core.precision import matmul_precision

    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
        feature_group_count=groups, precision=matmul_precision(), name=name,
    )


def _bn(name):
    return nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce, 3x3 (stride, groups), 1x1 expand x4."""

    width: int
    out_features: int
    stride: int = 1
    groups: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _conv(self.width, 1, name="conv1")(x)
        y = _bn("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = _conv(self.width, 3, stride=self.stride, groups=self.groups, name="conv2")(y)
        y = _bn("bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = _conv(self.out_features, 1, name="conv3")(y)
        y = _bn("bn3")(y, use_running_average=not train)
        if self.downsample:
            residual = _conv(self.out_features, 1, stride=self.stride, name="downsample_conv")(x)
            residual = _bn("downsample_bn")(residual, use_running_average=not train)
        return nn.relu(y + residual)


# (blocks per layer) for each supported trunk; reference model names
# (src/img_pretrain.py --img_model choices map 1:1).
ARCHS = {
    "resnet50": dict(layers=(3, 4, 6, 3), groups=1, width_factor=1),
    "resnet101": dict(layers=(3, 4, 23, 3), groups=1, width_factor=1),
    "resnet50_32": dict(layers=(3, 4, 6, 3), groups=32, width_factor=2),    # resnext50_32x4d
    "resnet101_32": dict(layers=(3, 4, 23, 3), groups=32, width_factor=4),  # resnext101_32x8d
    "resnet50_wide": dict(layers=(3, 4, 6, 3), groups=1, width_factor=2),   # wide_resnet50_2
    "resnet101_wide": dict(layers=(3, 4, 6, 3), groups=1, width_factor=2),  # reference maps
    # resnet101_wide to wide_resnet50_2 too (src/img_encoder.py:18-19)
    "tiny": dict(layers=(1, 1, 1, 1), groups=1, width_factor=1),  # tests / dryruns
}


class ResnetEncoder(nn.Module):
    """Reference ``Resnet``: truncated trunk + bias-free linear projection.

    Input  ``[b, H, W, 3]`` (NHWC), output ``[b, (H/16)*(W/16), embed_dim]``
    (or 1/32 with ``stage=4``).
    """

    embed_dim: int
    model: str = "resnet101"
    stage: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            # uint8 images must go through MultimodalSum.encode_img, which
            # normalises them on device (ImageNet mean/std) — a raw integer
            # batch reaching the trunk means a caller bypassed that path
            # and would silently train/eval on un-normalised pixels
            raise TypeError(
                f"ResnetEncoder expects normalised floating images, got "
                f"{x.dtype}; route uint8 batches through "
                f"MultimodalSum.encode_img")
        arch = ARCHS[self.model]
        layers: Sequence[int] = arch["layers"]
        groups, wf = arch["groups"], arch["width_factor"]

        from multimodalsum_tpu.core.precision import matmul_precision

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, precision=matmul_precision(), name="conv1")(x)
        x = _bn("bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def run_layer(x, layer_idx, blocks, base_width, out_features, stride, train):
            for b in range(blocks):
                x = Bottleneck(
                    width=base_width * wf,
                    out_features=out_features,
                    stride=stride if b == 0 else 1,
                    groups=groups,
                    downsample=(b == 0),
                    name=f"layer{layer_idx}_block{b}",
                )(x, train=train)
            return x

        # stages 1-2 are frozen: stop gradients after layer2 (reference :32-33)
        x = run_layer(x, 1, layers[0], 64, 256, 1, train)
        x = run_layer(x, 2, layers[1], 128, 512, 2, train)
        x = jax.lax.stop_gradient(x)

        x = run_layer(x, 3, layers[2], 256, 1024, 2, train)
        if self.stage == 4:
            x = run_layer(x, 4, layers[3], 512, 2048, 2, train)

        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)  # row-major (h, w) pixel order, as the
        # reference's flatten(start_dim=-2).transpose(1, 2) on NCHW
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                     precision=matmul_precision(), name="linear")(x)
        return x
