"""Fused TPU Pallas kernels (attention / LayerNorm / FFN / VQ) — all
differentiable via recompute VJPs, gated per-site by the
SCHEMANET_{ATTN,LN,MLP}_BACKEND env vars ('auto' -> Pallas on TPU-like
platforms, XLA elsewhere)."""

from .attention import attention_backend, fused_mhsa
from .layernorm import fused_layernorm, layernorm_backend
from .mlp import fused_mlp, mlp_backend


def any_fused_backend() -> bool:
    """True when any fused kernel is enabled — each fusion site re-checks its
    own backend, so this only grants permission to attempt fusion."""
    return (
        attention_backend() != "xla"
        or layernorm_backend() != "xla"
        or mlp_backend() != "xla"
    )
