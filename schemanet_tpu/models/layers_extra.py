"""Remainder of the reference layer zoo (``models/layers/``), for API parity.

These layers exist in the reference but are unused by its shipped ViT/DeiT
configs; they are provided so the zoo surface matches §2.11 of SURVEY.md:
ChannelNorm / LayerNorm2D / Norm registry (norm.py:11-80), NaN-tolerant batch
norm (nan_norm.py:77-115), 2-D MLP (mlp.py:36-65), Interpolate
(interpolate.py:8-15), conv helpers (models/utils.py:9-41).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import get_activation, pair


def conv_1x1(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, kernel_size=(1, 1), use_bias=use_bias, name=name)


def conv_3x3(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, kernel_size=(3, 3), padding=1, use_bias=use_bias, name=name)


def conv_out_shape(in_shape: Sequence[int], kernel: int, stride: int, padding: int) -> Tuple[int, ...]:
    return tuple((s + 2 * padding - kernel) // stride + 1 for s in in_shape)


class ChannelNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC feature maps (norm.py ChannelNorm)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon, reduction_axes=-1)(x)


class LayerNorm2D(nn.Module):
    """LayerNorm over (H, W, C) of NHWC maps (norm.py LaryerNorm2D [sic])."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon, reduction_axes=(-3, -2, -1))(x)


NORM_REGISTRY = {
    "channel_norm": ChannelNorm,
    "layer_norm_2d": LayerNorm2D,
    "layer_norm": nn.LayerNorm,
    "batch_norm": nn.BatchNorm,
    "none": lambda *a, **k: (lambda x: x),
}


def get_norm(name: str, **kwargs):
    """norm.py Norm_fn registry equivalent."""
    return NORM_REGISTRY[name](**kwargs)


class NanBatchNorm(nn.Module):
    """BatchNorm whose statistics ignore NaN entries (nan_norm.py:77-115):
    means/vars are computed over finite values only; NaNs pass through
    normalised with the finite statistics."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_ra = (
            self.use_running_average if use_running_average is None else use_running_average
        )
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,)))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            finite = jnp.isfinite(x)
            cnt = jnp.maximum(jnp.sum(finite, axis=tuple(range(x.ndim - 1))), 1)
            safe = jnp.where(finite, x, 0.0)
            mean = jnp.sum(safe, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum(jnp.where(finite, (x - mean) ** 2, 0.0), axis=tuple(range(x.ndim - 1)))
                / cnt
            )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class MLP2D(nn.Module):
    """1x1-conv MLP over NHWC maps (mlp.py MLP_2D)."""

    embed_dim: int
    dim_expand: float
    out_dim: int
    dropout: Optional[float] = None
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hidden = round(self.embed_dim * self.dim_expand)
        x = conv_1x1(hidden, name="linear1")(x)
        x = get_activation(self.activation)(x)
        if self.dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return conv_1x1(self.out_dim, name="linear2")(x)


class Interpolate(nn.Module):
    """Resize NHWC maps (interpolate.py:8-15)."""

    scale_factor: Optional[float] = None
    size: Optional[Tuple[int, int]] = None
    method: str = "bilinear"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if self.size is not None:
            oh, ow = pair(self.size)
        else:
            oh, ow = int(h * self.scale_factor), int(w * self.scale_factor)
        return jax.image.resize(x, (b, oh, ow, c), method=self.method)
