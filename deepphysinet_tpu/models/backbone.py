"""ResNet backbone family with multi-scale endpoints.

The reference registers a torchvision-style ResNet backbone that the shipped
model never invokes (model/backbone/resnet.py:106-209, SURVEY Q6) -- kept in
the component inventory as an available encoder for gridded-field variants.
This is a flax implementation of ResNet-18/34/50/101/152 with the same
``out_keys`` multi-scale endpoint selection ('C1'..'C5'); pretrained-URL
loading is not applicable here (torch checkpoints), so models initialize
randomly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deepphysinet_tpu.registry import Registry

BACKBONES = Registry("backbones")


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Multi-endpoint ResNet; ``out_keys`` selects C1..C5 feature maps."""

    stage_sizes: Sequence[int]
    block: type = BasicBlock
    out_keys: Tuple[str, ...] = ("C5",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        endpoints["C1"] = y
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**stage
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                y = self.block(features, strides)(y, train)
            endpoints[f"C{stage + 2}"] = y
        return {k: endpoints[k] for k in self.out_keys}


@BACKBONES.register("resnet18")
def resnet18(out_keys=("C5",), **_):
    return ResNet([2, 2, 2, 2], BasicBlock, tuple(out_keys))


@BACKBONES.register("resnet34")
def resnet34(out_keys=("C5",), **_):
    return ResNet([3, 4, 6, 3], BasicBlock, tuple(out_keys))


@BACKBONES.register("resnet50")
def resnet50(out_keys=("C5",), **_):
    return ResNet([3, 4, 6, 3], Bottleneck, tuple(out_keys))


@BACKBONES.register("resnet101")
def resnet101(out_keys=("C5",), **_):
    return ResNet([3, 4, 23, 3], Bottleneck, tuple(out_keys))


@BACKBONES.register("resnet152")
def resnet152(out_keys=("C5",), **_):
    return ResNet([3, 8, 36, 3], Bottleneck, tuple(out_keys))


def build_backbone(name: str = "resnet50", **kwargs):
    """model/backbone/builder.py:5-12 equivalent."""
    return BACKBONES.build(name, **kwargs)
