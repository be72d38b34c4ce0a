"""End-to-end logit parity: reference SchemaNet.forward (real C++ kernels) +
Matcher vs our SchemaAtlas + Matcher with ported parameters.

Inputs use REPEATED codes per sample — the realistic quantised regime, where
per-sample ragged vertex counts differ and the reference pads instance graphs
to the batch-max size (match.py:44-54). ``Matcher.ref_pooling`` divides our
fixed-slot pooling by the same batch-max live-slot count, so parity is exact
end to end with no input restrictions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from schemanet_tpu.schema import AtlasConfig, Matcher, SchemaAtlas
from tests.reference_models import import_reference_models
from tests.test_cpp_parity import cpp_ext  # noqa: F401 (fixture)

torch = pytest.importorskip("torch")

BS, L, M, K, DIM = 3, 10, 24, 5, 16


def test_full_logit_parity(cpp_ext, rng):  # noqa: F811
    import_reference_models()
    from schema_inference.graph.match import Matcher as RefMatcher
    from schema_inference.graph.schema_net import SchemaNet as RefSchemaNet

    # repeated codes per sample (realistic quantised inputs; ragged sizes vary)
    ingredients = rng.integers(0, M, size=(BS, L)).astype(np.int64)
    attn_cls = rng.normal(size=(BS, L)).astype(np.float32)
    attn = rng.normal(size=(BS, L, L)).astype(np.float32)

    torch.manual_seed(0)
    ref_schema = RefSchemaNet(
        num_vertices=M, num_classes=K, feat_h=2, feat_w=5,
        clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
        prune_node_threshold=0.001,
    )
    ref_matcher = RefMatcher(
        similarity="inner_product", num_codes=M,
        gnn_cfg=dict(embed_dim=DIM, num_layers=2, activation="relu"),
    ).eval()

    with torch.no_grad():
        inst = ref_schema(
            torch.from_numpy(ingredients.copy()),
            torch.from_numpy(attn.copy()),
            torch.from_numpy(attn_cls.copy()),
        )
        want = ref_matcher(inst, ref_schema.get_atlas()).numpy()

    # ---- ours with ported params -------------------------------------------
    cfg = AtlasConfig(
        num_vertices=M, num_classes=K, feat_h=2, feat_w=5,
        clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
        prune_node_threshold=0.001,
    )
    atlas = SchemaAtlas(cfg)
    atlas_params = {
        "vertex_weights": ref_schema.vertex_weights.tensor.detach().numpy(),
        "edge_weights": ref_schema.edge_weights.tensor.detach().numpy(),
        "vertex_attribute_weights": ref_schema.vertex_attribute_weights.tensor.detach().numpy(),
        "edge_attribute_weights": ref_schema.edge_attribute_weights.tensor.detach().numpy(),
    }
    variables = {
        "params": atlas_params,
        "buffers": {
            "class_ingredients": jnp.asarray(
                ref_schema.class_ingredients.tensor.numpy().astype(np.int32)
            )
        },
    }
    instance = atlas.apply(
        variables,
        jnp.asarray(ingredients.astype(np.int32)),
        jnp.asarray(attn),
        jnp.asarray(attn_cls),
    )
    num_slots = np.asarray(instance["num_slots"])
    assert num_slots.min() < L, "inputs must exercise the repeated-code regime"
    assert num_slots.min() != num_slots.max(), "ragged sizes must vary in-batch"
    atlas_dict = atlas.apply(variables, method="get_atlas")

    from tests.test_schema_parity import port_gnn_params

    matcher = Matcher(similarity="inner_product", num_codes=M, embed_dim=DIM, num_layers=2)
    # port the reference GNN weights (same layout as test_schema_parity)
    import tests.test_schema_parity as tsp

    tsp.LAYERS, tsp.M, tsp.DIM = 2, M, DIM  # port helper uses module constants
    gnn_params = port_gnn_params(ref_matcher.gnn)
    got = np.asarray(
        matcher.apply({"params": {"gnn": gnn_params}}, instance, atlas_dict)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_gradient_parity(cpp_ext, rng):  # noqa: F811
    """Gradients of the schema-inference loss wrt atlas + GNN params match the
    reference's autograd through its C++-built instance graphs."""
    import jax

    import_reference_models()
    from schema_inference.graph.match import Matcher as RefMatcher
    from schema_inference.graph.schema_net import SchemaNet as RefSchemaNet
    from schema_inference.loss.schema_inference_loss import SchemaInferenceLoss

    ingredients = rng.integers(0, M, size=(BS, L)).astype(np.int64)
    attn_cls = rng.normal(size=(BS, L)).astype(np.float32)
    attn = rng.normal(size=(BS, L, L)).astype(np.float32)
    labels = rng.integers(0, K, size=(BS,)).astype(np.int64)
    weights = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}

    torch.manual_seed(0)
    ref_schema = RefSchemaNet(
        num_vertices=M, num_classes=K, feat_h=2, feat_w=5,
        clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0, prune_node_threshold=0.001,
    )
    ref_matcher = RefMatcher(
        similarity="inner_product", num_codes=M,
        gnn_cfg=dict(embed_dim=DIM, num_layers=2, activation="relu"),
    ).eval()
    ref_loss = SchemaInferenceLoss()

    inst = ref_schema(
        torch.from_numpy(ingredients.copy()),
        torch.from_numpy(attn.copy()),
        torch.from_numpy(attn_cls.copy()),
    )
    atlas_t = ref_schema.get_atlas()
    pred = ref_matcher(inst, atlas_t)
    loss_dict = ref_loss(
        {"pred": pred, "class_vertices": atlas_t["class_vertices"],
         "class_edges": atlas_t["class_edges"]},
        {"label": torch.from_numpy(labels)},
    )
    total = sum(v * weights[k] for k, v in loss_dict.items() if k in weights)
    total.backward()
    ref_grads = {
        "vertex_weights": ref_schema.vertex_weights.tensor.grad.numpy(),
        "edge_weights": ref_schema.edge_weights.tensor.grad.numpy(),
        "vertex_attribute_weights": ref_schema.vertex_attribute_weights.tensor.grad.numpy(),
        "edge_attribute_weights": ref_schema.edge_attribute_weights.tensor.grad.numpy(),
        "embedding": ref_matcher.gnn.embedding.weight.grad.numpy(),
    }

    # ---- ours ---------------------------------------------------------------
    from schemanet_tpu.schema import get_loss_fn, weighted_total
    from tests.test_schema_parity import port_gnn_params
    import tests.test_schema_parity as tsp

    tsp.LAYERS, tsp.M, tsp.DIM = 2, M, DIM
    cfg = AtlasConfig(
        num_vertices=M, num_classes=K, feat_h=2, feat_w=5,
        clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0, prune_node_threshold=0.001,
    )
    atlas = SchemaAtlas(cfg)
    matcher = Matcher(similarity="inner_product", num_codes=M, embed_dim=DIM, num_layers=2)
    params = {
        "schema_net": {
            "vertex_weights": ref_schema.vertex_weights.tensor.detach().numpy(),
            "edge_weights": ref_schema.edge_weights.tensor.detach().numpy(),
            "vertex_attribute_weights": ref_schema.vertex_attribute_weights.tensor.detach().numpy(),
            "edge_attribute_weights": ref_schema.edge_attribute_weights.tensor.detach().numpy(),
        },
        "matcher": {"gnn": port_gnn_params(ref_matcher.gnn)},
    }
    buffers = {"class_ingredients": jnp.asarray(
        ref_schema.class_ingredients.tensor.numpy().astype(np.int32))}
    loss_fn = get_loss_fn({"name": "schema_inference_loss"})

    def total_fn(p):
        variables = {"params": p["schema_net"], "buffers": buffers}
        instance = atlas.apply(
            variables,
            jnp.asarray(ingredients.astype(np.int32)),
            jnp.asarray(attn), jnp.asarray(attn_cls),
        )
        atlas_dict = atlas.apply(variables, method="get_atlas")
        pred = matcher.apply({"params": p["matcher"]}, instance, atlas_dict)
        out = {"pred": pred, "class_vertices": atlas_dict["class_vertices"],
               "class_edges": atlas_dict["class_edges"]}
        return weighted_total(loss_fn(out, {"label": jnp.asarray(labels)}), weights)

    grads = jax.grad(total_fn)(params)
    for key in ("vertex_weights", "edge_weights", "vertex_attribute_weights",
                "edge_attribute_weights"):
        np.testing.assert_allclose(
            np.asarray(grads["schema_net"][key]), ref_grads[key],
            rtol=5e-3, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(grads["matcher"]["gnn"]["embedding"]), ref_grads["embedding"],
        rtol=5e-3, atol=1e-5, err_msg="gnn embedding",
    )
