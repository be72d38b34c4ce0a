"""Trained-checkpoint parity: train the ACTUAL torch reference predictor
(worker_schema_net.py assembly: traced backbone + discretization JITs via the
reference's own scripts/save_backbone_jit.py wrappers, SchemaNet with the real
compiled C++ graph kernels, Matcher, customs_param_group + AdamW + the real
schema-inference loss), then port the trained state (backbone, codebook,
atlas, GNN, attr weights) into the Flax predictor and assert equal eval
logits and accuracy on general inputs.

This is the strongest parity proof available in a zero-egress environment: it
exercises models/port.py, the ingredient-backbone capture path, VQ, the dense
graph build, ref_pooling, and the atlas/GNN param naming end to end against a
*trained* reference state (reference tasks/worker_schema_net.py:300-420).
"""

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models import get_model, merge_pretrained, torch_vit_to_flax
from schemanet_tpu.schema import build_predictor
from tests.reference_models import import_reference_models
from tests.test_cpp_parity import cpp_ext  # noqa: F401 (fixture)

torch = pytest.importorskip("torch")

IMG, PATCH, EMBED, N_LAYERS, HEADS = 32, 8, 32, 3, 2
M, K, DIM, ENC = 24, 5, 16, 1  # codes, classes, gnn dim, encode layer
GRID = IMG // PATCH  # 4 -> L = 16 tokens
BS, N_TRAIN, STEPS_PER_EPOCH, EPOCHS = 8, 40, 5, 12

MODEL_CFG = {
    "name": "vit",
    "transformer": {
        "embed_dim": EMBED, "num_encoder_layers": N_LAYERS, "num_heads": HEADS,
        "dim_feedforward": EMBED * 2, "dropout": None, "activation": "gelu",
        "final_norm": True, "norm_eps": 1e-6,
    },
    "patch_embed": {"name": "vit_like", "img_size": IMG, "patch_size": PATCH,
                    "image_channels": 3},
    "pos_encoding": {"name": "learnable", "dropout": None},
}
SCHEMA_CFG = {
    "matcher": {"similarity": "inner_product"},
    "gnn": {"embed_dim": DIM, "num_layers": 2, "activation": "relu"},
    "ir_atlas": dict(
        class_max_vertices=None, dist_pow=2, feat_h=GRID, feat_w=GRID,
        clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
        remove_self_loop=False, prune_node_threshold=0.001,
    ),
}
LOSS_WEIGHTS = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}


def _load_ref_save_jit_module():
    """Import the reference's scripts/save_backbone_jit.py (its tracing
    wrappers are module-level classes; argparse is __main__-guarded)."""
    import_reference_models()
    spec = importlib.util.spec_from_file_location(
        "ref_save_backbone_jit", "/root/reference/scripts/save_backbone_jit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_reference_predictor():
    """The worker_schema_net.py model assembly (lines 337-364), via the
    reference's own trace-export path (scripts/save_backbone_jit.py)."""
    save_jit = _load_ref_save_jit_module()
    from discretization import Discretization
    from models.vision_transformers import get_vit
    from schema_inference.graph import Matcher, SchemaNet, SchemaNetPredictor
    from schema_inference.utils import IngredientModelWrapper

    torch.manual_seed(0)
    backbone = get_vit(dict(MODEL_CFG), K).eval().requires_grad_(False)
    disc = Discretization(
        size=M, dim=EMBED, detach_input_seq=True, uniform_range=[-1.0, 1.0]
    ).eval().requires_grad_(False)

    decoupling = save_jit.Decoupling(
        encode_layer=f"transformer.layers.{ENC}",
        discretization=disc,
        extract_layer=f"transformer.layers.{ENC}.attention.attn_raw_identity",
    )
    model_input = torch.randn(2, 3, IMG, IMG)
    jit_wrapper = save_jit.BackboneJitWrapper(backbone, decoupling, model_input)
    mid_feat = jit_wrapper.backbone_forward(model_input)["mid_feat"]
    backbone_jit = torch.jit.trace(jit_wrapper.backbone_forward, (model_input,), strict=False)
    disc_jit = torch.jit.trace(
        save_jit.DiscretizationJitWrapper(disc), (mid_feat,), strict=False
    )

    ingredient_wrapper = IngredientModelWrapper(backbone_jit, disc_jit)
    schema_net = SchemaNet(
        num_vertices=M, num_classes=K, **SCHEMA_CFG["ir_atlas"]
    )
    matcher = Matcher(
        num_codes=M, gnn_cfg=SCHEMA_CFG["gnn"], **SCHEMA_CFG["matcher"]
    )
    return SchemaNetPredictor(ingredient_wrapper, schema_net, matcher), backbone, disc


def _train_reference(predictor, images, labels):
    """Mirror SchemaNetTrainer.train_iter (worker_schema_net.py:120-146):
    zero_grad -> schema_net.normalize() -> forward -> prefix-weighted loss ->
    backward -> step. Param groups via the real customs_param_group."""
    from schema_inference.loss.schema_inference_loss import SchemaInferenceLoss
    from schema_inference.utils import customs_param_group

    groups = customs_param_group(
        predictor.named_parameters(),
        [{"pattern": "schema_net", "cfg": {"weight_decay": 5.0e-4}},
         {"pattern": "matcher"}],
        drop_remain=True,
    )
    optimizer = torch.optim.AdamW(groups, lr=2e-3, weight_decay=0.05)
    loss_fn = SchemaInferenceLoss()

    losses = []
    predictor.train()
    for epoch in range(EPOCHS):
        for step in range(STEPS_PER_EPOCH):
            sl = slice(step * BS, (step + 1) * BS)
            x = torch.from_numpy(images[sl])
            y = torch.from_numpy(labels[sl])
            optimizer.zero_grad()
            predictor.schema_net.normalize()
            output = predictor(x)
            loss_dict = loss_fn(output, {"label": y})
            total = sum(
                v * LOSS_WEIGHTS[k.split(".")[0]]
                for k, v in loss_dict.items() if k.split(".")[0] in LOSS_WEIGHTS
            )
            total.backward()
            optimizer.step()
            losses.append(float(total.detach()))
    # final projection, as persisted at checkpoint time
    predictor.schema_net.normalize()
    predictor.eval()
    return losses


def _port_trained_state(predictor_flax, ref_backbone, ref_disc, ref_predictor):
    """Assemble the Flax param/buffer trees from the trained torch state —
    the same layout schema_net_worker builds from a bundle (workers.py:159-174)."""
    from tests.test_schema_parity import port_gnn_params
    import tests.test_schema_parity as tsp

    tsp.LAYERS, tsp.M, tsp.DIM = SCHEMA_CFG["gnn"]["num_layers"], M, DIM

    dummy = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = predictor_flax.init(jax.random.PRNGKey(0), dummy, method="init_full")
    params = dict(variables["params"])
    buffers = dict(variables["buffers"])

    sd = {k: v.detach().numpy() for k, v in ref_backbone.state_dict().items()}
    params["backbone"] = merge_pretrained(
        params["backbone"], torch_vit_to_flax(sd, num_layers=N_LAYERS)
    )
    params["ingredient_backbone"] = {
        "vocabulary": jnp.asarray(ref_disc.vocabulary.weight.detach().numpy())
    }
    sn = ref_predictor.schema_net
    params["schema_net"] = {
        "vertex_weights": jnp.asarray(sn.vertex_weights.tensor.detach().numpy()),
        "edge_weights": jnp.asarray(sn.edge_weights.tensor.detach().numpy()),
        "vertex_attribute_weights": jnp.asarray(
            sn.vertex_attribute_weights.tensor.detach().numpy()),
        "edge_attribute_weights": jnp.asarray(
            sn.edge_attribute_weights.tensor.detach().numpy()),
    }
    params["matcher"] = {"gnn": port_gnn_params(ref_predictor.matcher.gnn)}
    buffers["schema_net"] = {
        "class_ingredients": jnp.asarray(
            sn.class_ingredients.tensor.numpy().astype(np.int32))
    }
    return params, buffers


def test_trained_checkpoint_parity(cpp_ext, rng):  # noqa: F811
    ref_predictor, ref_backbone, ref_disc = _build_reference_predictor()

    images = rng.normal(size=(N_TRAIN, 3, IMG, IMG)).astype(np.float32)
    labels = rng.integers(0, K, size=(N_TRAIN,)).astype(np.int64)
    losses = _train_reference(ref_predictor, images, labels)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), "reference did not train"

    heldout = rng.normal(size=(16, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref_train = ref_predictor(torch.from_numpy(images))
        ref_held = ref_predictor(torch.from_numpy(heldout), requires_graph=True)
    ref_train_logits = ref_train["pred"].numpy()
    ref_held_logits = ref_held["pred"].numpy()
    ref_train_acc = float((ref_train_logits.argmax(-1) == labels).mean())

    # ---- port the trained checkpoint into the Flax predictor ----------------
    predictor_flax = build_predictor(
        MODEL_CFG, SCHEMA_CFG, num_classes=K, num_codes=M, code_dim=EMBED,
        encode_layer=ENC, uniform_range=(-1.0, 1.0),
    )
    params, buffers = _port_trained_state(
        predictor_flax, ref_backbone, ref_disc, ref_predictor
    )

    def run(x_nchw, requires_graph=False):
        x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
        return predictor_flax.apply(
            {"params": params, "buffers": buffers}, x, requires_graph=requires_graph
        )

    got_held = run(heldout, requires_graph=True)
    # ingredient-level agreement first (diagnoses VQ/codepath drift separately)
    ref_ing = np.sort(ref_held["ingredients"].numpy(), axis=-1)
    got_ing = np.sort(np.asarray(got_held["ingredients"]), axis=-1)
    np.testing.assert_array_equal(got_ing, ref_ing, err_msg="VQ code assignment")

    np.testing.assert_allclose(
        np.asarray(got_held["pred"]), ref_held_logits, rtol=2e-3, atol=1e-4,
        err_msg="held-out logits",
    )
    got_train_logits = np.asarray(run(images)["pred"])
    np.testing.assert_allclose(
        got_train_logits, ref_train_logits, rtol=2e-3, atol=1e-4,
        err_msg="train logits",
    )
    got_train_acc = float((got_train_logits.argmax(-1) == labels).mean())
    assert got_train_acc == ref_train_acc
    assert (got_train_logits.argmax(-1) == ref_train_logits.argmax(-1)).all()
    # trained state should be above chance on the memorised set (the frozen
    # random backbone bounds how separable noise images can get)
    assert ref_train_acc > 1.0 / K, f"trained accuracy {ref_train_acc} <= chance"
