"""MidExtractor-style convenience over the capture API.

The reference grabs intermediate activations with cv_lib's MidExtractor
(forward hooks matched by module name, used at
``scripts/extract_ingredients.py:88``). Here activations are returned by the
pure function; this wrapper provides the same "give me features by name"
ergonomics for users migrating from the reference, including a translation of
reference-style module names (``module.transformer.layers.9`` ->
``layers_9.out``, ``...layers.9.attention.attn_raw_identity`` ->
``layers_9.attn_raw``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def translate_probe_name(name: str) -> str:
    """Reference hook-target name -> capture probe name."""
    name = name.removeprefix("module.").removeprefix("transformer.")
    parts = name.split(".")
    if parts[0] == "layers" and len(parts) >= 2 and parts[1].isdigit():
        layer = parts[1]
        rest = parts[2:]
        if not rest:
            return f"layers_{layer}.out"
        if rest[-1] == "attn_raw_identity":
            return f"layers_{layer}.attn_raw"
        if rest[-1] == "attn_identity":
            return f"layers_{layer}.attn"
        if rest[-1] == "identity1":
            return f"layers_{layer}.resid1"
        if rest[-1] == "identity2":
            return f"layers_{layer}.resid2"
    if name.startswith("layers_"):
        return name if "." in name else f"{name}.out"
    raise KeyError(f"cannot translate probe name {name!r}")


class MidExtractor:
    """Jitted feature grabber: ``extractor(images) -> {name: activation}``."""

    def __init__(self, model, params, extract_names: Sequence[str]):
        self.model = model
        self.extract_names = list(extract_names)
        probes: Tuple[str, ...] = tuple(
            translate_probe_name(n) for n in self.extract_names
        )

        @jax.jit
        def run(p, images):
            out = model.apply({"params": p}, images, capture=probes)
            return out["captured"]

        self._run = run
        self._params = params
        self._probe_of = dict(zip(self.extract_names, probes))
        self.features: Dict[str, jnp.ndarray] = {}

    def __call__(self, images) -> Dict[str, jnp.ndarray]:
        captured = self._run(self._params, images)
        self.features = {
            name: captured[probe] for name, probe in self._probe_of.items()
        }
        return self.features
