"""Compositional YAML config loading.

Mirrors the reference semantics of ``cv_lib.utils.get_cfg``: a YAML file is
loaded into a plain dict; values that are *paths to other YAML files* (the
``dataset:`` and ``model:`` keys in experiment configs, see reference
``config/cifar_100/ingredient/deit_tiny-l9-M_1024.yaml:1,11``) are resolved by
the caller with another ``get_cfg`` call. We add an explicit helper
``resolve_subconfig`` for that one-level file reference, plus dotted-path CLI
overrides which the reference lacks.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml


def get_cfg(path: str) -> Dict[str, Any]:
    """Load a YAML config file into a dict (expanding ~ and env vars)."""
    path = os.path.expandvars(os.path.expanduser(str(path)))
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if cfg is None:
        cfg = {}
    return cfg


def resolve_subconfig(value: Any, base_dir: Optional[str] = None) -> Dict[str, Any]:
    """Resolve a config value that may be an inline dict or a YAML file path.

    The reference uses path references relative to the repo root (e.g.
    ``dataset: config/datasets/cifar_100.yaml``); we additionally try
    ``base_dir`` so configs are usable from any CWD.
    """
    if isinstance(value, dict):
        return value
    if not isinstance(value, str):
        raise TypeError(f"expected dict or path, got {type(value)}")
    candidates = [value]
    if base_dir is not None:
        candidates.append(os.path.join(base_dir, value))
    for cand in candidates:
        expanded = os.path.expandvars(os.path.expanduser(cand))
        if os.path.isfile(expanded):
            return get_cfg(expanded)
    raise FileNotFoundError(f"sub-config not found: {value!r} (tried {candidates})")


def apply_overrides(
    cfg: Dict[str, Any],
    overrides: Dict[str, Any],
    base_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` style dotted-path overrides, returning a copy.

    A dotted path may descend THROUGH a sub-config file reference (e.g.
    ``dataset.num_classes`` when the experiment YAML has
    ``dataset: configs/datasets/synthetic.yaml``): the reference is resolved
    inline first. Reference files that wrap their payload under the same key
    (the ``model:`` convention) are unwrapped so the dotted path reads the
    same either way; downstream ``resolve_subconfig`` calls are no-ops on the
    already-resolved dict.
    """
    out = copy.deepcopy(cfg)
    for dotted, value in overrides.items():
        node = out
        parts = dotted.split(".")
        for key in parts[:-1]:
            # integer segments index into list nodes (e.g.
            # ``training.param_groups.0.cfg.nu_dtype=bfloat16``)
            if isinstance(node, list):
                node = node[int(key)]
                continue
            child = node.get(key) if isinstance(node, dict) else None
            if isinstance(child, str):
                resolved = resolve_subconfig(child, base_dir)
                node[key] = resolved.get(key, resolved)
            node = node.setdefault(key, {})
        if isinstance(node, list):
            node[int(parts[-1])] = value
        else:
            node[parts[-1]] = value
    return out


def parse_override_strings(pairs) -> Dict[str, Any]:
    """Parse ``key=value`` strings; values go through YAML for typing."""
    out: Dict[str, Any] = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        out[key.strip()] = yaml.safe_load(raw)
    return out
