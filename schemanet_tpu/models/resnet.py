"""ResNet family — the 'official_models' entry of the reference registry
(``models/__init__.py:18-22`` delegates to cv_lib's torchvision zoo; shipped
configs never use it, but the capability is part of the model-zoo surface).

Standard torchvision-architecture ResNets (18/34/50) in Flax: BasicBlock /
Bottleneck, BatchNorm with running statistics in the ``batch_stats``
collection, NHWC layout. Output follows the framework's dict convention
({"pred": logits}).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        out_features = self.features * self.expansion
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: Callable = BasicBlock
    dtype: jnp.dtype = jnp.float32
    # kept for get_model interface compatibility with the ViT path
    img_size: int = 224
    image_channels: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: Tuple[str, ...] = ()):
        train = not deterministic
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        captured: Dict[str, jnp.ndarray] = {}
        for i, size in enumerate(self.stage_sizes):
            for j in range(size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(
                    features=64 * 2**i, strides=strides, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
            probe = f"layer{i + 1}.out"
            if probe in capture:
                captured[probe] = x
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        out: Dict[str, Any] = {"pred": logits}
        if capture:
            out["captured"] = captured
        return out


RESNET_SPECS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block=BasicBlock),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block=BasicBlock),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block=Bottleneck),
}


def build_resnet(model_cfg: Dict[str, Any], num_classes: int, dtype=jnp.float32) -> ResNet:
    name = model_cfg.get("model_name", model_cfg.get("name", "resnet18"))
    spec = RESNET_SPECS[name]
    return ResNet(num_classes=num_classes, dtype=dtype, **spec)
