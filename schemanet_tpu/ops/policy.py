"""Central kernel/backend policy — tuned defaults live HERE, not in env vars.

Round 3 shipped seven `SCHEMANET_*` env knobs whose campaign-winning values
were not the defaults, which is exactly how the round-3 headline regression
happened (the driver benches with a clean environment). This module is the
single source of truth: every backend/variant choice resolves through
``resolve(field)``, whose "auto" expansion encodes the measured winners, and
the env vars are demoted to explicit overrides for A/B sweeps.

Measured winners (round-3 chip campaign, bench_campaign_r03.log, CIFAR
SchemaNet step bs=1024 bf16 unless noted):

==========  =======  =====================================================
field       winner   evidence
==========  =======  =====================================================
attn        pallas   [X1] xla 124.1 ms vs 97.6 default — fused flash wins
block       pallas   r04 [BL1]: whole-encoder-half fusion 87.6 -> 74.3 ms
                     (frozen forwards only; see ops/pallas/encoder_block.py)
ln          xla      [X2] 87.5 ms vs 97.6 pallas — the round-3 regression:
                     the fwd-only backbone LN loses to XLA's fused epilogue
mlp         pallas   [X3] xla 105.5 ms vs 97.6 — VMEM-resident hidden wins
gnn_ln      xla      round-3 A/B: CIFAR 101.8->97.7, ImageNet 486->404 ms
graphconv   pallas   r04 [E]: fused sym-conv kernel 322.7 -> 314.7 ms at
                     ImageNet; neutral at CIFAR [E1] (shape gate keeps small
                     graphs on the XLA batched dot)
vq          xla      streaming-argmin kernel worthwhile only for very large
                     vocabularies; opt-in
atlas_opt   xla      r04 [OPT1]/[OPT2]: fused AdamW+projection kernel LOST
                     (CIFAR 75.6 vs 74.4, ImageNet 372.8 vs 322.7 ms); the
                     kernel stays available for future hardware
symconv     single   [AB10] two 99.8 vs 97.6 single; with ln=xla [X5] 89.7
                     vs [X2] 87.5 — E_sym materialisation wins at both
static_embed_bwd blocked  [AB2] sorted_scatter 97.4 ~= blocked 97.6 at CIFAR;
                     blocked avoids the scatter at ImageNet scale
embed_bwd   xla      dynamic-id (instance path) embedding backward; the
                     `pallas`/`pallas2` VMEM-histogram kernels
                     (ops/pallas/embed_bwd.py) are BLOCKED on-chip: the r05
                     bisect showed in-loop dynamic-index VMEM stores crash
                     the Mosaic remote compiler (PERFORMANCE.md #24) — kept
                     for a fixed toolchain, interpret mode works everywhere
attn_pack   off      r05 [HP-c]: pair-packed d=64 attention LOST (69.39 vs
                     68.15 ms cifar, PERFORMANCE.md #23); off everywhere
==========  =======  =====================================================

Config surface: a ``kernels:`` mapping in the YAML (or ``--set kernels.ln=…``)
lands in :func:`configure`; workers call it before building the model. Env
vars (``SCHEMANET_ATTN_BACKEND`` etc.) override BOTH — they exist for on-chip
sweeps, never for shipping a default.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# "auto" expansion per platform: the measured winners above on TPU, plain XLA
# everywhere else (the Mosaic kernels only compile for TPU; tests opt into
# interpret mode explicitly).
_AUTO_TPU = {
    "attn": "pallas",
    "ln": "xla",
    "mlp": "pallas",
    # whole-encoder-half fusion for frozen forwards (ops/pallas/encoder_block)
    # — r04 campaign [BL1]: 87.6 -> 74.3 ms at the CIFAR SchemaNet step
    "block": "pallas",
    "gnn_ln": "xla",
    # r04 campaign [E]: the fused sym_conv beats XLA on ImageNet class graphs
    # (322.7 -> 314.7 ms; kills the E_sym materialise/transpose copies) and is
    # neutral at CIFAR ([E1], where the shape gate keeps class graphs on XLA
    # anyway — ops/pallas/graphconv.py shape_fits_kernel)
    "graphconv": "pallas",
    "vq": "xla",
    "symconv": "single",
    "static_embed_bwd": "blocked",
    # dynamic-id embedding backward (instance path, scatter-scale): the VMEM
    # histogram kernel (ops/pallas/embed_bwd.py) crashes the current Mosaic
    # remote compiler (in-loop dynamic stores — r05 bisect, PERFORMANCE.md
    # #24); xla scatter-add stays the default until the toolchain fixes it
    "embed_bwd": "xla",
    "prng_impl": "threefry",
    # fused AdamW+projection for the atlas tensors (ops/pallas/atlas_opt.py):
    # measured and LOST on this chip (r04 [OPT1]/[OPT2] — CIFAR 75.6 vs 74.4,
    # ImageNet 372.8 vs 322.7 ms; PERFORMANCE.md #19); stays opt-in
    "atlas_opt": "xla",
    # pair-packed head_dim-64 attention inside the fused encoder half
    # (ops/pallas/encoder_block.py): packs 2 heads into one 128-deep MXU
    # score matmul + one block-diagonal AV matmul. Measured r05 [HP-c] and
    # LOST (69.39 vs 68.15 ms at CIFAR — the packing relayouts cost more
    # than the halved serial op chain saves); stays off, kept for A/B.
    "attn_pack": "off",
}
_AUTO_CPU = dict(
    _AUTO_TPU, attn="xla", mlp="xla", block="xla", graphconv="xla"
)  # identical variants; only the Mosaic-kernel fields change

_ENV = {
    "attn": "SCHEMANET_ATTN_BACKEND",
    "block": "SCHEMANET_BLOCK_BACKEND",
    "ln": "SCHEMANET_LN_BACKEND",
    "mlp": "SCHEMANET_MLP_BACKEND",
    "gnn_ln": "SCHEMANET_GNN_LN_BACKEND",
    "graphconv": "SCHEMANET_GRAPHCONV_BACKEND",
    "vq": "SCHEMANET_VQ_BACKEND",
    "symconv": "SCHEMANET_SYMCONV",
    "static_embed_bwd": "SCHEMANET_STATIC_EMBED_BWD",
    "embed_bwd": "SCHEMANET_EMBED_BWD",
    "prng_impl": "SCHEMANET_PRNG_IMPL",
    "atlas_opt": "SCHEMANET_ATLAS_OPT",
    "attn_pack": "SCHEMANET_ATTN_PACK",
}

_CHOICES = {
    "attn": ("auto", "pallas", "interpret", "xla"),
    "block": ("auto", "pallas", "interpret", "xla"),
    "ln": ("auto", "pallas", "interpret", "xla"),
    "mlp": ("auto", "pallas", "interpret", "xla"),
    "gnn_ln": ("auto", "pallas", "interpret", "xla"),
    "graphconv": ("auto", "pallas", "interpret", "xla"),
    "vq": ("auto", "pallas", "xla"),
    "symconv": ("auto", "single", "two"),
    "static_embed_bwd": ("auto", "blocked", "sorted_scatter"),
    # pallas2/interpret2 = the 2-way shadow-accumulator ILP variant
    "embed_bwd": ("auto", "pallas", "pallas2", "interpret", "interpret2", "xla"),
    "prng_impl": ("auto", "threefry", "rbg"),
    "atlas_opt": ("auto", "fused", "interpret", "xla"),
    "attn_pack": ("auto", "pair", "off"),
}


@dataclasses.dataclass
class KernelPolicy:
    attn: str = "auto"
    block: str = "auto"
    ln: str = "auto"
    mlp: str = "auto"
    gnn_ln: str = "auto"
    graphconv: str = "auto"
    vq: str = "auto"
    symconv: str = "auto"
    static_embed_bwd: str = "auto"
    embed_bwd: str = "auto"
    prng_impl: str = "auto"
    atlas_opt: str = "auto"
    attn_pack: str = "auto"


_policy = KernelPolicy()


def get_policy() -> KernelPolicy:
    return _policy


def configure(kernels: Mapping[str, str] | None) -> None:
    """Apply a config-file ``kernels:`` mapping (unknown keys rejected)."""
    if not kernels:
        return
    for k, v in kernels.items():
        if k not in _ENV:
            raise KeyError(
                f"unknown kernels.{k} (choose from {sorted(_ENV)})"
            )
        if v not in _CHOICES[k]:
            raise ValueError(
                f"kernels.{k}={v!r} invalid (choose from {_CHOICES[k]})"
            )
        setattr(_policy, k, v)


def set_policy(**kw: str) -> None:
    configure(kw)


def reset_policy() -> None:
    global _policy
    _policy = KernelPolicy()


def resolve(field: str) -> str:
    """env override > configured policy > tuned per-platform default."""
    value = os.environ.get(_ENV[field]) or getattr(_policy, field)
    if value == "auto":
        value = (_AUTO_TPU if _on_tpu() else _AUTO_CPU)[field]
    return value
