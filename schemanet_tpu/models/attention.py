"""Multi-head self-attention returning (output, attn, attn_raw).

Functional re-design of reference ``models/transformer/mha.py:12-265``. The
reference exposes post-softmax and pre-softmax ("raw") attention through
nn.Identity probe points consumed by name-matched forward hooks; here the
probes are simply *returned* (and surfaced by the transformer through Flax
``sow``) — activation capture is part of the function signature, not a hook.

attn shapes are [bs, H, n, n] (the reference's [bs*H, n, n] unflattened, as the
IngredientModelWrapper immediately unflattens them anyway,
``ingredient_model_wrapper.py:61``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # [bs, H, n, d_k]
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,  # additive float mask
    deterministic: bool = True,
    dropout: Optional[float] = None,
    dropout_rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (out [bs,H,n,d_k], attn, attn_raw); q pre-scaled by 1/sqrt(d_k)
    like the reference (mha.py:253-257)."""
    d_k = q.shape[-1]
    q = q / jnp.sqrt(d_k).astype(q.dtype)
    attn_raw = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    attn_logits = attn_raw if attn_mask is None else attn_raw + attn_mask
    attn = nn.softmax(attn_logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout and not deterministic:
        import jax

        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, attn.shape)
        attn_used = jnp.where(keep, attn / (1.0 - dropout), 0.0)
    else:
        attn_used = attn
    out = jnp.einsum("bhqk,bhkd->bhqd", attn_used, v)
    return out, attn, attn_raw


class MultiHeadSelfAttention(nn.Module):
    num_heads: int
    embed_dim: int
    dropout: Optional[float] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        seq: jnp.ndarray,  # [bs, n, dim]
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        assert self.embed_dim % self.num_heads == 0
        bs, n, dim = seq.shape
        head_dim = self.embed_dim // self.num_heads
        # fused qkv projection, matching the reference's single linear_qkv
        qkv = nn.Dense(
            3 * self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="linear_qkv",
        )(seq)
        qkv = qkv.reshape(bs, n, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
        )  # each [bs, H, n, d_k]
        dropout_rng = (
            self.make_rng("dropout") if (self.dropout and not deterministic) else None
        )
        out, attn, attn_raw = dot_product_attention(
            q,
            k,
            v,
            attn_mask=attn_mask,
            deterministic=deterministic,
            dropout=self.dropout,
            dropout_rng=dropout_rng,
        )
        out = jnp.moveaxis(out, 1, 2).reshape(bs, n, self.embed_dim)
        out = nn.Dense(
            self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="linear_out",
        )(out)
        return out, attn, attn_raw
