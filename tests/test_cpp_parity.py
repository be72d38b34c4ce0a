"""Golden tests against the reference's ACTUAL compiled C++ kernels.

Builds the unmodified reference cpp_extension (CPU libtorch) into a temp dir
and compares the dense TPU ops' outputs with the real kernels — one level
stronger than the numpy oracle. Skipped when the toolchain/libtorch headers
are unavailable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from schemanet_tpu import ops

torch = pytest.importorskip("torch")

BS, L, V = 3, 20, 12


@pytest.fixture(scope="module")
def cpp_ext():
    try:
        import os

        from torch.utils import cpp_extension

        os.makedirs("/tmp/refext", exist_ok=True)
        srcs = [
            "/root/reference/cpp_extension/src/" + f
            for f in (
                "extension.cpp",
                "feat_to_v_attr.cpp",
                "large_scale_feat_to_v.cpp",
                "feat_to_e.cpp",
                "large_scale_feat_to_e.cpp",
                "utils.cpp",
            )
        ]
        ext = cpp_extension.load(
            name="refext",
            sources=srcs,
            extra_include_paths=["/root/reference/cpp_extension/include"],
            build_directory="/tmp/refext",
            verbose=False,
        )
        # the reference package does `from .extension import ...` — alias our
        # build as that submodule so schema_net.py's lazy imports resolve
        import sys

        sys.modules.setdefault("extension", ext)
        sys.modules.setdefault("cpp_extension.extension", ext)
        return ext
    except Exception as exc:  # pragma: no cover - toolchain dependent
        pytest.skip(f"cannot build reference cpp_extension: {exc}")


@pytest.fixture
def inputs(rng):
    ingredients = rng.integers(0, V, size=(BS, L)).astype(np.int64)
    attn_cls = rng.uniform(size=(BS, L)).astype(np.float32)
    attn_cls /= attn_cls.sum(-1, keepdims=True)
    attn = rng.uniform(size=(BS, L, L)).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    geo = rng.uniform(size=(L, L)).astype(np.float32)
    w_v = np.full((2, 1), 0.5, np.float32)
    w_e = np.full((2, 1), 0.5, np.float32)
    return ingredients, attn_cls, attn, geo, w_v, w_e


def test_feat_to_v_attr_vs_cpp(cpp_ext, inputs):
    ingredients, attn_cls, *_ = inputs
    want = cpp_ext.feat_to_v_attr(
        torch.from_numpy(ingredients), torch.from_numpy(attn_cls), V, True, False
    ).numpy()
    got = np.asarray(
        ops.vertex_attributes_full(
            jnp.asarray(ingredients.astype(np.int32)), jnp.asarray(attn_cls), V
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_feat_to_instance_v_vs_cpp(cpp_ext, inputs):
    ingredients, attn_cls, _, _, w_v, _ = inputs
    v_ids, v_w, sizes = cpp_ext.feat_to_instance_v(
        torch.from_numpy(ingredients), torch.from_numpy(attn_cls),
        torch.from_numpy(w_v), True,
    )
    slots = ops.compact_instance_slots(jnp.asarray(ingredients.astype(np.int32)), V)
    got_w = np.asarray(
        ops.instance_vertices(slots, jnp.asarray(attn_cls), jnp.asarray(w_v), None)
    )
    # NOTE: the C++ applies no softmax — the python caller does (schema_net.py
    # :297). Mirror by comparing against instance_vertices fed pre-softmaxed...
    # instead feed the C++ the same softmaxed attn the op computes internally.
    from schemanet_tpu.ops.graph import clamp_softmax, _zero_nans

    sm = np.asarray(_zero_nans(clamp_softmax(jnp.asarray(attn_cls), None)))
    v_ids, v_w, sizes = cpp_ext.feat_to_instance_v(
        torch.from_numpy(ingredients), torch.from_numpy(sm), torch.from_numpy(w_v), True
    )
    offsets = np.concatenate([[0], np.cumsum(sizes.numpy())])
    n_slots = np.asarray(slots.num_slots)
    codes = np.asarray(slots.codes)
    for b in range(BS):
        n = int(n_slots[b])
        assert n == int(sizes[b])
        ref_ids = v_ids.numpy()[offsets[b] : offsets[b + 1]]
        ref_w = v_w.numpy()[offsets[b] : offsets[b + 1]]
        np.testing.assert_array_equal(codes[b, :n], ref_ids)
        np.testing.assert_allclose(got_w[b, :n], ref_w, rtol=1e-4, atol=1e-6)


def test_feat_to_instance_e_vs_cpp(cpp_ext, inputs):
    ingredients, _, attn, geo, _, w_e = inputs
    from schemanet_tpu.ops.graph import clamp_softmax, _zero_nans

    sm = np.asarray(_zero_nans(clamp_softmax(jnp.asarray(attn), None)))
    slots = ops.compact_instance_slots(jnp.asarray(ingredients.astype(np.int32)), V)
    codes = np.asarray(slots.codes)
    n_slots = np.asarray(slots.num_slots)
    dicts = [
        {int(c): i for i, c in enumerate(codes[b, : int(n_slots[b])])} for b in range(BS)
    ]
    ref_edges = cpp_ext.feat_to_instance_e(
        torch.from_numpy(ingredients), torch.from_numpy(sm), torch.from_numpy(geo),
        dicts, torch.from_numpy(w_e), True, False,
    )
    got = np.asarray(
        ops.instance_edges(
            slots, jnp.asarray(attn), jnp.asarray(geo), jnp.asarray(w_e), None
        )
    )
    for b in range(BS):
        n = int(n_slots[b])
        np.testing.assert_allclose(
            got[b, :n, :n], ref_edges[b].numpy(), rtol=1e-4, atol=1e-6
        )


def test_feat_to_e_vs_cpp(cpp_ext, inputs, rng):
    ingredients, _, attn, geo, _, w_e = inputs
    from schemanet_tpu.ops.graph import clamp_softmax

    k, v_max = 4, 6
    class_ing = np.stack([rng.permutation(V)[:v_max] for _ in range(k)]).astype(np.int64)
    labels = rng.integers(0, k, size=(BS,)).astype(np.int64)
    dicts = [{int(c): s for s, c in enumerate(row)} for row in class_ing]
    sm = np.asarray(clamp_softmax(jnp.asarray(attn), None))
    # reference path: C++ kernel then normalize/blend in python (schema_net.py:249-254)
    raw = cpp_ext.feat_to_e(
        torch.from_numpy(ingredients), torch.from_numpy(sm), torch.from_numpy(geo),
        dicts, labels.tolist(), v_max, True,
    )
    e = raw / raw.sum(dim=2, keepdim=True)
    e = torch.nan_to_num(e, nan=0.0)
    want = (e @ torch.from_numpy(w_e)).squeeze(-1).numpy()
    got = np.asarray(
        ops.class_limited_edges(
            jnp.asarray(ingredients.astype(np.int32)), jnp.asarray(attn),
            jnp.asarray(geo), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(class_ing.astype(np.int32)), jnp.asarray(w_e), None,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
