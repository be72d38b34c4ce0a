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


def split_qkv_params(qkv_params: dict, embed_dim: int):
    """Slice a fused linear_qkv param dict into (q, k, v) weight/bias views —
    the functional equivalent of the reference's get_weight_q/k/v accessors
    (mha.py:42-106). Flax kernels are [in, out], so slices are on axis 1."""
    kernel = qkv_params["kernel"]
    bias = qkv_params.get("bias")
    out = {}
    for i, name in enumerate("qkv"):
        sl = slice(i * embed_dim, (i + 1) * embed_dim)
        out[name] = {
            "kernel": kernel[:, sl],
            **({"bias": bias[sl]} if bias is not None else {}),
        }
    return out


def head_slice(weight: jnp.ndarray, head_id: int, num_heads: int, axis: int = 1):
    """Per-head slice of a q/k/v kernel (reference get_head_weight)."""
    head_dim = weight.shape[axis] // num_heads
    idx = [slice(None)] * weight.ndim
    idx[axis] = slice(head_id * head_dim, (head_id + 1) * head_dim)
    return weight[tuple(idx)]


class MultiHeadSelfAttention(nn.Module):
    """Fused-qkv MHSA. ``detach_w_qk``/``detach_w_v`` reproduce the reference's
    seprate_qkv selective-detach research paths (mha.py:167-193): gradients are
    stopped through W_q/W_k (resp. W_v) while the forward values are identical
    to the fused path."""

    num_heads: int
    embed_dim: int
    dropout: Optional[float] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    detach_w_qk: bool = False
    detach_w_v: bool = False

    @nn.compact
    def __call__(
        self,
        seq: jnp.ndarray,  # [bs, n, dim]
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        fused: bool = False,
        quant: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        assert self.embed_dim % self.num_heads == 0
        bs, n, dim = seq.shape
        head_dim = self.embed_dim // self.num_heads
        # fused qkv projection, matching the reference's single linear_qkv
        dense_qkv = nn.Dense(
            3 * self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="linear_qkv",
        )
        dense_out = nn.Dense(
            self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="linear_out",
        )
        if quant and not self.is_initializing():
            # W8A8 PTQ of the projections (frozen-backbone inference only —
            # extraction/eval/serving; ops/quant.py): the score math below is
            # untouched and still takes the fused Pallas path when available
            from ..ops.quant import int8_dense

            def project(dense, x):
                _ = dense(x[:, :1])  # materialise params only (DCE'd)
                return int8_dense(x, dense.variables["params"])

        else:
            project = lambda dense, x: dense(x)
        if self.detach_w_qk or self.detach_w_v:
            qkv = self._detached_qkv(dense_qkv, seq)
        else:
            qkv = project(dense_qkv, seq)
        if (
            fused
            and not self.is_initializing()  # init may run on a host device
            and attn_mask is None
        ):
            # Pallas flash path: scores never reach HBM (forward OR backward —
            # the kernel carries a recompute VJP, ops/pallas/attention.py) and
            # the qkv layout stays untouched; attn probes are unavailable —
            # Transformer.run only requests this when nothing captures them.
            # Attention dropout runs in-kernel via the stateless hash mask
            # (ops/pallas/dropmask.py), which lowers on every backend —
            # interpret mode included.
            from ..ops.pallas.attention import attention_backend, fused_mhsa

            backend = attention_backend()
            dropout_live = bool(self.dropout) and not deterministic
            if backend in ("pallas", "interpret"):
                kwargs = {}
                if dropout_live:
                    import jax

                    kwargs = dict(
                        dropout_p=float(self.dropout),
                        seed=jax.random.randint(
                            self.make_rng("dropout"), (), 0, 2**31 - 1,
                            dtype=jnp.int32,
                        ),
                    )
                out = fused_mhsa(
                    qkv, self.num_heads, interpret=backend == "interpret", **kwargs
                )
                return project(dense_out, out), None, None
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
        return project(dense_out, out), attn, attn_raw

    def _detached_qkv(self, dense_qkv: nn.Dense, seq: jnp.ndarray) -> jnp.ndarray:
        """Apply the fused projection with per-block stop_gradient on the
        q/k (and/or v) weight slices."""
        import jax

        # materialise params by applying once (ensures initialisation), then
        # recompute with sliced/stop-gradient weights
        _ = dense_qkv(seq[:, :1])
        kernel = dense_qkv.variables["params"]["kernel"]
        bias = dense_qkv.variables["params"].get("bias")
        d = self.embed_dim
        blocks = []
        for i in range(3):
            w = kernel[:, i * d : (i + 1) * d]
            b = bias[i * d : (i + 1) * d] if bias is not None else None
            detach = self.detach_w_qk if i < 2 else self.detach_w_v
            if detach:
                w = jax.lax.stop_gradient(w)
                b = jax.lax.stop_gradient(b) if b is not None else None
            y = jnp.einsum("bnd,do->bno", seq, w.astype(self.dtype))
            if b is not None:
                y = y + b.astype(self.dtype)
            blocks.append(y)
        return jnp.concatenate(blocks, axis=-1)
