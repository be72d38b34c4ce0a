"""Pre/post-norm Transformer encoder with declarative activation capture.

Reference: ``models/transformer/transformer.py:11-173``. The reference's
nn.Identity probe points (``identity1/identity2`` residual probes,
``attn_identity``/``attn_raw_identity``) + name-matched forward hooks become an
explicit ``capture`` argument: a static tuple of probe names such as
``("layers_9.out", "layers_9.attn_raw")``; captured tensors are returned in a
dict. Everything stays a pure function — no hook machinery, fully jittable.

Probe names:
    layers_{i}.out        — output sequence of encoder layer i
    layers_{i}.attn       — post-softmax attention [bs, H, n, n]
    layers_{i}.attn_raw   — pre-softmax (scaled) attention [bs, H, n, n]
    layers_{i}.attn_hmean — head-MEAN of attn_raw [bs, n, n] (fp32-reduced).
                            Unlike attn/attn_raw this probe does not force the
                            plain path: the whole-layer fused kernel emits it
                            directly (ops/pallas/encoder_block.py attn_block
                            capture_hmean), so the SchemaNet capture layer
                            keeps its fusion and the HBM hand-off is H x
                            smaller. The reference surfaces the full raw
                            attention and its wrapper means over heads
                            (ingredient_model_wrapper.py:61); only the mean is
                            ever consumed by the graph build.
    layers_{i}.resid1     — attention residual sum before dropout (identity1)
    layers_{i}.resid2     — mlp residual sum before dropout (identity2)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadSelfAttention
from .layers import MLP


class EncoderLayer(nn.Module):
    num_heads: int
    embed_dim: int
    dim_feedforward: int
    dropout: Optional[float] = None
    activation: str = "relu"
    norm_eps: float = 1e-5
    pre_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        seq: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        fused: bool = False,
        fused_ln: Optional[bool] = None,  # LN fusion is probe-independent
        quant: bool = False,  # W8A8 projections (frozen-forward only)
        block_fuse: bool = False,  # whole-layer fusion (no probes at all)
        capture_hmean: bool = False,  # surface the attn_hmean probe
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        fused_ln = fused if fused_ln is None else fused_ln
        attention = MultiHeadSelfAttention(
            self.num_heads, self.embed_dim, self.dropout, dtype=self.dtype, name="attention"
        )
        mlp = MLP(
            self.embed_dim,
            self.dim_feedforward,
            self.dropout,
            self.activation,
            dtype=self.dtype,
            name="mlp",
        )
        norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")

        # whole-layer fusion for the FROZEN deterministic forward: two Pallas
        # kernels per layer instead of ~6 HBM activation round trips
        # (ops/pallas/encoder_block.py). `block_fuse` is set by Transformer.run
        # only when NO probe of this layer is captured; dropout-live / masked /
        # post-norm / quantised calls keep the per-op paths too.
        if (
            block_fuse
            and deterministic
            and self.pre_norm
            and attn_mask is None
            and not quant
            and not self.is_initializing()
        ):
            from ..ops.pallas.encoder_block import attn_block, block_backend, ffn_block

            backend = block_backend()
            if backend in ("pallas", "interpret"):
                interp = backend == "interpret"
                # materialise submodule params only (tiny calls, DCE'd)
                _ = attention(seq[:1, :1], None, True, False, False)
                _ = mlp(seq[:1, :1], True)
                _ = norm1(seq[:1, :1]), norm2(seq[:1, :1])
                pa = attention.variables["params"]
                pm = mlp.variables["params"]
                p1 = norm1.variables["params"]
                p2 = norm2.variables["params"]
                seq = attn_block(
                    seq, p1["scale"], p1["bias"],
                    pa["linear_qkv"]["kernel"], pa["linear_qkv"]["bias"],
                    pa["linear_out"]["kernel"], pa["linear_out"]["bias"],
                    self.num_heads, eps=self.norm_eps, interpret=interp,
                    capture_hmean=capture_hmean,
                )
                probes = {}
                if capture_hmean:
                    seq, hmean = seq
                    probes["attn_hmean"] = hmean
                seq = ffn_block(
                    seq, p2["scale"], p2["bias"],
                    pm["linear1"]["kernel"], pm["linear1"]["bias"],
                    pm["linear2"]["kernel"], pm["linear2"]["bias"],
                    activation=self.activation, eps=self.norm_eps, interpret=interp,
                )
                probes["out"] = seq
                return seq, probes

        def dropped(x):
            if self.dropout and not deterministic:
                return nn.Dropout(self.dropout, deterministic=False)(x)
            return x

        def apply_norm(ln, x):
            # fused (frozen-forward) path: one Pallas pass instead of XLA's
            # compute-bound convert+reduce fusions (~1.6 ms each at d=192;
            # see ops/pallas/layernorm.py). Params stay owned by the
            # nn.LayerNorm module (same ckpt tree); forward-only like the
            # flash-attention path.
            if fused_ln and not self.is_initializing():
                from ..ops.pallas.layernorm import fused_layernorm, layernorm_backend

                backend = layernorm_backend()
                if backend in ("pallas", "interpret"):
                    _ = ln(x[:1, :1])  # materialise params only (DCE'd)
                    p = ln.variables["params"]
                    return fused_layernorm(
                        x, p["scale"], p["bias"], self.norm_eps,
                        interpret=backend == "interpret",
                    )
            return ln(x)

        def apply_mlp(x):
            # fused FFN: fc1 -> act -> fc2 with the [.., dim_feedforward]
            # hidden state never leaving VMEM (ops/pallas/mlp.py) — the
            # hidden-state HBM round trip profiled at ~22% of the SchemaNet
            # step, and it re-materialises in the backward without the
            # kernel's recompute VJP. FFN dropout runs in-kernel via the
            # stateless hash mask (ops/pallas/dropmask.py), which lowers on
            # every backend — interpret mode included.
            if quant and not self.is_initializing():
                # int8 fc1/fc2 beats the bf16 fused-FFN kernel at the MXU's
                # 2x int8 rate; hidden-state HBM traffic returns but at half
                # the bytes (int8 dot output is the narrow [.., d] tensor)
                return mlp(x, deterministic, quant=True)
            if fused_ln and not self.is_initializing():
                from ..ops.pallas.mlp import fused_mlp, mlp_backend

                backend = mlp_backend()
                dropout_live = bool(self.dropout) and not deterministic
                if backend in ("pallas", "interpret"):
                    _ = mlp(x[:1, :1], True)  # materialise params only (DCE'd)
                    p = mlp.variables["params"]
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
                    return fused_mlp(
                        x,
                        p["linear1"]["kernel"], p["linear1"]["bias"],
                        p["linear2"]["kernel"], p["linear2"]["bias"],
                        activation=self.activation,
                        interpret=backend == "interpret",
                        **kwargs,
                    )
            return mlp(x, deterministic)

        probes: Dict[str, jnp.ndarray] = {}
        if self.pre_norm:
            x, attn, attn_raw = attention(
                apply_norm(norm1, seq), attn_mask, deterministic, fused, quant
            )
            probes["resid1"] = seq + x
            seq = seq + dropped(x)
            x = apply_mlp(apply_norm(norm2, seq))
            probes["resid2"] = seq + x
            seq = seq + dropped(x)
        else:
            x, attn, attn_raw = attention(seq, attn_mask, deterministic, fused, quant)
            x = apply_norm(norm1, x)
            probes["resid1"] = seq + x
            seq = seq + dropped(x)
            x = apply_norm(norm2, apply_mlp(seq))
            probes["resid2"] = seq + x
            seq = seq + dropped(x)
        if attn is not None:  # unavailable on the fused (Pallas) path
            probes["attn"] = attn
            probes["attn_raw"] = attn_raw
            # same fp32 reduce the kernel capture does; uncaptured probes are
            # DCE'd by XLA so this costs nothing unless requested
            probes["attn_hmean"] = jnp.mean(
                attn_raw.astype(jnp.float32), axis=1
            ).astype(attn_raw.dtype)
        probes["out"] = seq
        return seq, probes


class Transformer(nn.Module):
    """Encoder stack (transformer.py:96-173); final LayerNorm optional.

    ``run(seq, start_layer, end_layer)`` executes a contiguous slice of the
    stack — the functional replacement for the reference's hook-substitution
    trick that re-enters the model with a replaced mid feature
    (save_backbone_jit.py:78-90 cls_header trace).
    """

    num_encoder_layers: int = 12
    num_heads: int = 8
    embed_dim: int = 512
    dim_feedforward: int = 2048
    dropout: Optional[float] = None
    activation: str = "relu"
    final_norm: bool = True
    norm_eps: float = 1e-5
    pre_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            EncoderLayer(
                num_heads=self.num_heads,
                embed_dim=self.embed_dim,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                activation=self.activation,
                norm_eps=self.norm_eps,
                pre_norm=self.pre_norm,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.norm = (
            nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")
            if self.final_norm
            else None
        )

    def run(
        self,
        seq: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        capture: Tuple[str, ...] = (),
        start_layer: int = 0,
        end_layer: Optional[int] = None,
        fused_attention: Optional[bool] = None,
        quant: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        if fused_attention is None:
            # default-on where a fused backend is available: the kernels carry
            # recompute VJPs, so TRAINING takes them too (stage-0 fine-tuning
            # previously paid ~8% MFU on the XLA attention/LN/FFN path)
            from ..ops.pallas import any_fused_backend

            fused_attention = any_fused_backend()
        end_layer = self.num_encoder_layers if end_layer is None else end_layer
        captured: Dict[str, jnp.ndarray] = {}
        if not self.pre_norm and self.norm is not None and start_layer == 0:
            seq = self.norm(seq)  # post-norm applies the final norm first (ref :146-153)
        for i in range(start_layer, end_layer):
            # the fused kernel cannot surface attention probes — any layer
            # whose attn/attn_raw is captured takes the plain XLA path
            attn_probe_i = any(
                c in capture for c in (f"layers_{i}.attn", f"layers_{i}.attn_raw")
            )
            # attn_hmean is special: the flash path can't surface it, but the
            # whole-layer fused kernel emits it directly (capture_hmean) —
            # so it blocks the flash path, not block fusion; if the block
            # branch declines at runtime the layer falls through to the plain
            # path, which derives the probe from attn_raw
            hmean_i = f"layers_{i}.attn_hmean" in capture
            fused_i = fused_attention and not attn_probe_i and not hmean_i
            # whole-layer fusion additionally requires NO intermediate probe
            # of this layer (resid1/resid2); 'out' equals the returned seq
            block_i = (
                fused_attention
                and not attn_probe_i
                and not any(
                    c in capture
                    for c in (f"layers_{i}.resid1", f"layers_{i}.resid2")
                )
            )
            seq, probes = self.layers[i](
                seq, attn_mask, deterministic, fused_i, fused_attention, quant,
                block_i, hmean_i,
            )
            for kind, value in probes.items():
                probe_name = f"layers_{i}.{kind}"
                if probe_name in capture:
                    captured[probe_name] = value
        if (
            self.pre_norm
            and self.norm is not None
            and end_layer == self.num_encoder_layers
        ):
            seq = self.norm(seq)
        return seq, captured

    def __call__(
        self,
        seq: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        capture: Tuple[str, ...] = (),
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        return self.run(seq, attn_mask, deterministic, capture)
