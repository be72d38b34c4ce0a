"""Backbone building blocks (reference ``models/layers/``), as Flax modules.

Design deltas from the reference:
* batch-major ``[bs, n, dim]`` layout everywhere (the reference is token-major
  ``[n, bs, dim]``, ``models/vision_transformers/vit.py:42-56``) — batch-major
  keeps the leading axis shardable over the data mesh and matches XLA's
  preferred batched-matmul layouts;
* parameter initialisers mirror the reference's so from-scratch runs are
  statistically comparable (cites inline).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    # exact (erf) gelu to match torch nn.GELU's default
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "glu": nn.glu,
    "swish": nn.swish,
    "sigmoid": nn.sigmoid,
    "hard_sigmoid": nn.hard_sigmoid,
    "none": lambda x: x,
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """models/layers/__init__.py:16-27 registry equivalent."""
    return ACTIVATIONS[name]


def pair(x) -> Tuple[int, int]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class PatchEmbed(nn.Module):
    """Conv patchifier -> token sequence [bs, N, dim] (layers/patch_embed.py:19-54)."""

    img_size: int = 224
    patch_size: int = 16
    image_channels: int = 3
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, int]:
        ih, iw = pair(self.img_size)
        ph, pw = pair(self.patch_size)
        return ih // ph, iw // pw

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [bs, H, W, C] (NHWC — TPU-native conv layout)
        ph, pw = pair(self.patch_size)
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(ph, pw),
            strides=(ph, pw),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1.0),  # ref: init.normal_
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        bs = x.shape[0]
        return x.reshape(bs, -1, self.embed_dim)  # row-major (h, w) flatten


class LearnablePosEncoding(nn.Module):
    """Additive learned positional table (layers/pos_encoding.py:22-40)."""

    num_tokens: int
    embed_dim: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, seq: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, self.num_tokens, self.embed_dim),
        )
        seq = seq + pos.astype(seq.dtype)
        if self.dropout:
            seq = nn.Dropout(self.dropout)(seq, deterministic=deterministic)
        return seq


class IdentityPosEncoding(nn.Module):
    """'identity' pos-encoding option (layers/pos_encoding.py:9-19)."""

    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, seq: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.dropout:
            seq = nn.Dropout(self.dropout)(seq, deterministic=deterministic)
        return seq


class MLP(nn.Module):
    """Transformer FFN (layers/mlp.py:8-33)."""

    embed_dim: int
    dim_feedforward: int
    dropout: Optional[float] = None
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, quant: bool = False
    ) -> jnp.ndarray:
        # ref bias init: normal(mean=1e-6) — irrelevant under pretrained load,
        # replicated for from-scratch statistical parity.
        bias_init = lambda key, shape, dtype=jnp.float32: (
            1e-6 + jax.random.normal(key, shape, dtype)
        )
        if quant and not self.is_initializing():
            # W8A8 PTQ (frozen-backbone inference; ops/quant.py)
            from ..ops.quant import int8_dense

            def apply(dense, x):
                _ = dense(x[:, :1] if x.ndim == 3 else x[:1])
                return int8_dense(x, dense.variables["params"])

        else:
            apply = lambda dense, x: dense(x)
        x = apply(
            nn.Dense(
                self.dim_feedforward,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=bias_init,
                name="linear1",
            ),
            x,
        )
        x = get_activation(self.activation)(x)
        if self.dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = apply(
            nn.Dense(
                self.embed_dim,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=bias_init,
                name="linear2",
            ),
            x,
        )
        return x


def drop_path(
    key: jax.Array, x: jnp.ndarray, rate: float, deterministic: bool
) -> jnp.ndarray:
    """Stochastic depth (layers/drop_path.py:7-38); per-sample Bernoulli."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0)
