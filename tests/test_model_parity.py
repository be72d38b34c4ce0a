"""Parity: Flax ViT/DeiT with ported weights vs the reference torch models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models import get_model, merge_pretrained, torch_vit_to_flax
from tests.reference_models import import_reference_models

torch = pytest.importorskip("torch")

TINY_CFG = {
    "name": "vit",
    "transformer": {
        "embed_dim": 32,
        "num_encoder_layers": 3,
        "num_heads": 2,
        "dim_feedforward": 64,
        "dropout": None,
        "activation": "gelu",
        "final_norm": True,
        "norm_eps": 1e-6,
    },
    "patch_embed": {"name": "vit_like", "img_size": 32, "patch_size": 16, "image_channels": 3},
    "pos_encoding": {"name": "learnable", "dropout": None},
}
NUM_CLASSES = 7


def build_ref(name="vit"):
    ref_models = import_reference_models()
    from models.vision_transformers import get_deit, get_vit

    cfg = dict(TINY_CFG)
    torch.manual_seed(0)
    if name == "deit":
        return get_deit(cfg, NUM_CLASSES).eval()
    return get_vit(cfg, NUM_CLASSES).eval()


def port_params(ref_model, flax_model, x_nhwc):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    ported = torch_vit_to_flax(sd, num_layers=TINY_CFG["transformer"]["num_encoder_layers"])
    init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))["params"]
    return merge_pretrained(init, ported)


@pytest.mark.parametrize("name", ["vit", "deit"])
def test_forward_parity(rng, name):
    ref = build_ref(name)
    cfg = dict(TINY_CFG, name=name)
    flax_model = get_model(cfg, NUM_CLASSES)

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    params = port_params(ref, flax_model, x_nhwc)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    if isinstance(ref_out, dict):
        ref_out = ref_out["pred"]
    got = flax_model.apply({"params": params}, jnp.asarray(x_nhwc))["pred"]
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), rtol=1e-4, atol=1e-5)


def test_capture_matches_hooked_reference(rng):
    """Mid-layer output + raw attention capture vs the reference's hook probes."""
    ref = build_ref("vit")
    flax_model = get_model(TINY_CFG, NUM_CLASSES)

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    params = port_params(ref, flax_model, x_nhwc)

    grabbed = {}
    layer_idx = 1
    layer = ref.transformer.layers[layer_idx]
    layer.register_forward_hook(lambda m, i, o: grabbed.__setitem__("out", o))
    layer.attention.attn_raw_identity.register_forward_hook(
        lambda m, i, o: grabbed.__setitem__("attn_raw", o)
    )
    with torch.no_grad():
        ref(torch.from_numpy(x))

    out = flax_model.apply(
        {"params": params},
        jnp.asarray(x_nhwc),
        capture=(f"layers_{layer_idx}.out", f"layers_{layer_idx}.attn_raw"),
    )
    cap = out["captured"]
    # reference layer output is token-major [n, bs, d]
    ref_mid = grabbed["out"].numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(
        np.asarray(cap[f"layers_{layer_idx}.out"]), ref_mid, rtol=1e-4, atol=1e-4
    )
    # reference raw attention is [bs*H, n, n]
    bs, h = 2, TINY_CFG["transformer"]["num_heads"]
    ref_attn = grabbed["attn_raw"].numpy().reshape(bs, h, *grabbed["attn_raw"].shape[-2:])
    np.testing.assert_allclose(
        np.asarray(cap[f"layers_{layer_idx}.attn_raw"]), ref_attn, rtol=1e-4, atol=1e-4
    )


def test_resume_from_layer_equals_full_forward(rng):
    """encode_until + resume_from_layer == one full forward (no VQ in between)."""
    flax_model = get_model(TINY_CFG, NUM_CLASSES)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    variables = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = flax_model.apply(variables, jnp.asarray(x))["pred"]
    mid, _ = flax_model.apply(variables, jnp.asarray(x), 2, method="encode_until")
    resumed = flax_model.apply(variables, mid, 2, method="resume_from_layer")["pred"]
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full), rtol=1e-5, atol=1e-6)


def test_lax_names_keeps_local_head(rng):
    ref = build_ref("vit")
    flax_model = get_model(TINY_CFG, num_classes=13)  # different class count
    x_nhwc = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ported = torch_vit_to_flax(sd, num_layers=3)
    init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))["params"]
    merged = merge_pretrained(init, ported, lax_names=["cls_head.weight", "cls_head.bias"])
    assert merged["cls_head"]["kernel"].shape == (32, 13)
    np.testing.assert_allclose(
        np.asarray(merged["transformer"]["layers_0"]["attention"]["linear_qkv"]["kernel"]),
        sd["transformer.layers.0.attention.linear_qkv.weight"].T,
    )
