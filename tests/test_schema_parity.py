"""Parity: GNN/matcher, IR-Atlas getters/projection, and loss vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.schema import (
    AtlasConfig,
    Matcher,
    get_loss_fn,
    project_atlas_params,
    rectify_linear,
    weighted_total,
)
from schemanet_tpu.schema.gnn import GNN
from tests.reference_models import import_reference_models

torch = pytest.importorskip("torch")

M, DIM, LAYERS, K, V = 11, 16, 2, 5, 7


def build_ref_gnn():
    import_reference_models()
    from schema_inference.graph.gnn import GNN as RefGNN

    torch.manual_seed(0)
    return RefGNN(num_codes=M, embed_dim=DIM, num_layers=LAYERS, activation="relu").eval()


def port_gnn_params(ref_gnn):
    sd = {k: v.detach().numpy() for k, v in ref_gnn.state_dict().items()}
    params = {"embedding": sd["embedding.weight"], "fc": {
        "kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}}
    for i in range(LAYERS):
        params[f"layers_{i}"] = {
            "g_conv": {
                "linear": {
                    "kernel": sd[f"layers.{i}.g_conv.linear.weight"].T,
                    "bias": sd[f"layers.{i}.g_conv.linear.bias"],
                }
            },
            "norm": {
                "scale": sd[f"layers.{i}.norm.weight"],
                "bias": sd[f"layers.{i}.norm.bias"],
            },
        }
    return params


def test_gnn_parity(rng):
    ref = build_ref_gnn()
    gnn = GNN(num_codes=M, embed_dim=DIM, num_layers=LAYERS)
    params = port_gnn_params(ref)

    bs, n = 3, 6
    nodes = rng.uniform(size=(bs, n)).astype(np.float32)
    edges = rng.uniform(size=(bs, n, n)).astype(np.float32)
    ingredients = rng.integers(0, M, size=(bs, n))
    # mark the tail of each sample as padding (dummy code, zero weight)
    mask = np.zeros((bs, n), bool)
    for b, pad in enumerate([0, 2, 3]):
        if pad:
            mask[b, n - pad :] = True
            ingredients[b, n - pad :] = M
            nodes[b, n - pad :] = 0
            edges[b, n - pad :, :] = 0
            edges[b, :, n - pad :] = 0

    with torch.no_grad():
        want = ref(
            nodes=torch.from_numpy(nodes),
            edges=torch.from_numpy(edges),
            ingredients=torch.from_numpy(ingredients),
            feat_mask=torch.from_numpy(mask),
        ).numpy()
    got = gnn.apply(
        {"params": params},
        nodes=jnp.asarray(nodes),
        edges=jnp.asarray(edges),
        ingredients=jnp.asarray(ingredients),
        feat_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("similarity", ["cosine", "euclidean", "inner_product"])
def test_matcher_similarity_parity(rng, similarity):
    import_reference_models()
    from schema_inference.graph.match import Matcher as RefMatcher

    torch.manual_seed(1)
    ref = RefMatcher(
        similarity=similarity,
        num_codes=M,
        gnn_cfg=dict(embed_dim=DIM, num_layers=LAYERS, activation="relu"),
    ).eval()
    a = rng.normal(size=(4, 5, DIM)).astype(np.float32)
    b = rng.normal(size=(4, 5, DIM)).astype(np.float32)
    want = ref.similarity(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    from schemanet_tpu.schema import similarity_fn

    got = np.asarray(similarity_fn(similarity)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _ref_schema_net(**over):
    import_reference_models()
    from schema_inference.graph.schema_net import SchemaNet

    torch.manual_seed(2)
    kwargs = dict(
        num_vertices=M,
        num_classes=K,
        class_max_vertices=V,
        remove_self_loop=True,
        prune_node_threshold=0.02,
    )
    kwargs.update(over)
    return SchemaNet(**kwargs)


def _atlas_params_from_ref(ref):
    return {
        "vertex_weights": ref.vertex_weights.tensor.detach().numpy(),
        "edge_weights": ref.edge_weights.tensor.detach().numpy(),
        "vertex_attribute_weights": ref.vertex_attribute_weights.tensor.detach().numpy(),
        "edge_attribute_weights": ref.edge_attribute_weights.tensor.detach().numpy(),
    }


def test_atlas_getters_parity(rng):
    ref = _ref_schema_net()
    # randomise weights beyond the init to exercise the getters
    with torch.no_grad():
        ref.vertex_weights.tensor.copy_(torch.rand(K, V) - 0.1)
        ref.edge_weights.tensor.copy_(torch.rand(K, V, V) - 0.1)
    params = _atlas_params_from_ref(ref)

    cfg = AtlasConfig(
        num_vertices=M,
        num_classes=K,
        class_max_vertices=V,
        remove_self_loop=True,
        prune_node_threshold=0.02,
    )
    from schemanet_tpu.schema import SchemaAtlas

    atlas = SchemaAtlas(cfg)
    class_ing = np.stack([np.random.default_rng(i).permutation(M)[:V] for i in range(K)])
    variables = {
        "params": params,
        "buffers": {"class_ingredients": jnp.asarray(class_ing, jnp.int32)},
    }

    got_v = np.asarray(atlas.apply(variables, method="get_class_vertices"))
    want_v = ref.get_class_vertices().detach().numpy()
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-6)

    got_e = np.asarray(atlas.apply(variables, method="get_class_edges"))
    want_e = ref.get_class_edges().detach().numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=1e-5, atol=1e-6)


def test_projection_parity():
    ref = _ref_schema_net()
    with torch.no_grad():
        ref.vertex_weights.tensor.copy_(torch.rand(K, V) * 3 - 0.5)
        ref.edge_weights.tensor.copy_(torch.rand(K, V, V) * 3 - 0.5)
        ref.vertex_attribute_weights.tensor.copy_(torch.tensor([[0.001], [50.0]]))
    params = _atlas_params_from_ref(ref)
    cfg = AtlasConfig(
        num_vertices=M, num_classes=K, class_max_vertices=V, remove_self_loop=True
    )
    got = project_atlas_params({k: jnp.asarray(v) for k, v in params.items()}, cfg)
    ref.normalize()
    want = _atlas_params_from_ref(ref)
    for key in params:
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key], rtol=1e-5, atol=1e-6, err_msg=key
        )


def test_schema_loss_parity(rng):
    import_reference_models()
    from schema_inference.loss.schema_inference_loss import SchemaInferenceLoss

    ref_loss = SchemaInferenceLoss(re_a_vertex=3.0, re_a_edge=4.0)
    logits = rng.normal(size=(6, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(6,))
    cv = rng.uniform(size=(K, V)).astype(np.float32)
    cv /= cv.sum(-1, keepdims=True)
    ce = rng.uniform(size=(K, V, V)).astype(np.float32)
    ce /= ce.sum(-1, keepdims=True)

    want = ref_loss(
        {"pred": torch.from_numpy(logits), "class_vertices": torch.from_numpy(cv),
         "class_edges": torch.from_numpy(ce)},
        {"label": torch.from_numpy(labels)},
    )
    loss_fn = get_loss_fn(
        {"name": "schema_inference_loss", "loss_cfg": {"re_a_vertex": 3.0, "re_a_edge": 4.0}}
    )
    got = loss_fn(
        {"pred": jnp.asarray(logits), "class_vertices": jnp.asarray(cv),
         "class_edges": jnp.asarray(ce)},
        {"label": jnp.asarray(labels)},
    )
    for key in want:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=1e-4, atol=1e-5, err_msg=key
        )
    weights = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}
    got_total = float(weighted_total(got, weights))
    want_total = sum(float(want[k]) * w for k, w in weights.items())
    np.testing.assert_allclose(got_total, want_total, rtol=1e-4)


def test_rectify_linear_below_threshold():
    x = jnp.asarray(1.5)
    got = float(rectify_linear(x, a=3.0))
    assert abs(got - (3.0 - 1.0 + 1.0 / (1.0 + 3.0 - 1.5))) < 1e-6
    # gradient stays positive below a
    g = float(jax.grad(lambda y: rectify_linear(y, a=3.0))(x))
    assert g > 0


def test_sym_conv_custom_vjp_matches_autodiff(rng):
    # _sym_conv (single matmul over a recomputed E_sym; custom backward
    # computes dE once and symmetrises) must equal plain autodiff of the
    # textbook formula, values and gradients
    from schemanet_tpu.schema.gnn import _sym_conv

    e = jnp.asarray(rng.normal(size=(3, 9, 9)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(3, 9, 6)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(3, 9, 6)).astype(np.float32))

    def plain(e, f):
        sym = 0.5 * (e + jnp.swapaxes(e, 1, 2)) + jnp.eye(e.shape[1])[None]
        return jnp.einsum("bnm,bmd->bnd", sym, f)

    np.testing.assert_allclose(_sym_conv(e, f), plain(e, f), rtol=1e-5, atol=1e-5)
    de, df = jax.vjp(_sym_conv, e, f)[1](ct)
    de_ref, df_ref = jax.vjp(plain, e, f)[1](ct)
    np.testing.assert_allclose(de, de_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(df, df_ref, rtol=1e-5, atol=1e-5)


def test_sym_conv_two_matches_single(rng):
    # the non-materialising two-matmul formulation (SCHEMANET_SYMCONV=two)
    # must match _sym_conv in values and gradients
    from schemanet_tpu.schema.gnn import _sym_conv, _sym_conv_two

    e = jnp.asarray(rng.normal(size=(3, 9, 9)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(3, 9, 6)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(3, 9, 6)).astype(np.float32))

    np.testing.assert_allclose(_sym_conv_two(e, f), _sym_conv(e, f), rtol=1e-5, atol=1e-5)
    de, df = jax.vjp(_sym_conv_two, e, f)[1](ct)
    de_ref, df_ref = jax.vjp(_sym_conv, e, f)[1](ct)
    np.testing.assert_allclose(de, de_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(df, df_ref, rtol=1e-5, atol=1e-5)
