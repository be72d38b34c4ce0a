"""Weight-porting at the REAL DeiT-Tiny shape (12 layers, 192 dim, 3 heads,
224px/patch16 -> 197 tokens, 1000-class head).

The toy-shape parity tests (test_model_parity.py, 3 layers/32px) validate the
porting math; this suite validates it at the exact shape and key naming of the
reference's renamed official DeiT checkpoints (README.md:50-58), including the
file round trip through ``load_pretrain_into`` (torch.load + 'model' wrapper
unwrap, utils/model.py:10-36) and the ``lax_names`` head-mismatch tolerance
used when fine-tuning the 1000-class checkpoint on a 100-class dataset
(config/cifar_100/vanilla/deit_tiny.yaml:43)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models import get_model
from schemanet_tpu.models.port import load_pretrain_into
from tests.reference_models import import_reference_models

torch = pytest.importorskip("torch")

DEIT_TINY_CFG = {
    "name": "vit",  # all shipped reference configs use name: vit (SURVEY §2.11)
    "transformer": {
        "embed_dim": 192,
        "num_encoder_layers": 12,
        "num_heads": 3,
        "dim_feedforward": 768,
        "dropout": None,
        "activation": "gelu",
        "final_norm": True,
        "norm_eps": 1e-6,
    },
    "patch_embed": {
        "name": "vit_like", "img_size": 224, "patch_size": 16, "image_channels": 3,
    },
    "pos_encoding": {"name": "learnable", "dropout": None},
}
IMAGENET_CLASSES = 1000


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    """A reference-model state dict at the real DeiT-Tiny shape, saved with
    the official checkpoints' 'model' wrapper key."""
    import_reference_models()
    from models.vision_transformers import get_vit

    torch.manual_seed(0)
    model = get_vit(dict(DEIT_TINY_CFG), IMAGENET_CLASSES).eval()
    path = tmp_path_factory.mktemp("ckpt") / "deit_tiny_real_shape.pth"
    torch.save({"model": model.state_dict()}, str(path))
    return model, str(path)


def test_full_shape_logit_parity(ref_ckpt, rng):
    model, path = ref_ckpt
    flax_model = get_model(DEIT_TINY_CFG, IMAGENET_CLASSES)
    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))["params"]
    params = load_pretrain_into(init, path, num_layers=12)

    # every weight matrix must have come from the checkpoint, not local init
    # (zero-init biases / ones-init LN scales are identical in both frameworks,
    # so only randomly-initialised leaves can witness the overlay)
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("kernel") or name in ("cls_token", "pos_embed.pos_embed"):
            assert not np.array_equal(np.asarray(leaf), np.asarray(flat_init[path])), (
                f"{name} kept its local init"
            )

    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x))
    if isinstance(ref_logits, dict):
        ref_logits = ref_logits["pred"]
    got = flax_model.apply({"params": params}, jnp.asarray(x_nhwc))["pred"]
    assert got.shape == (2, IMAGENET_CLASSES)
    np.testing.assert_allclose(
        np.asarray(got), ref_logits.numpy(), rtol=1e-4, atol=1e-4
    )


def test_lax_names_head_mismatch_at_real_shape(ref_ckpt, rng):
    # 1000-class checkpoint into a 100-class model: cls_head keeps the local
    # init (lax_names), the 12-layer backbone ports — verified by matching the
    # reference's layer-11 output through the capture path
    model, path = ref_ckpt
    num_classes = 100
    flax_model = get_model(DEIT_TINY_CFG, num_classes)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    init = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))["params"]
    params = load_pretrain_into(
        init, path, lax_names=["cls_head.weight", "cls_head.bias"], num_layers=12
    )
    assert params["cls_head"]["kernel"].shape == (192, num_classes)
    np.testing.assert_array_equal(
        np.asarray(params["cls_head"]["kernel"]),
        np.asarray(init["cls_head"]["kernel"]),
    )

    grabbed = {}
    model.transformer.layers[11].register_forward_hook(
        lambda m, i, o: grabbed.__setitem__("out", o)
    )
    with torch.no_grad():
        model(torch.from_numpy(x))
    out = flax_model.apply(
        {"params": params}, jnp.asarray(x_nhwc), capture=("layers_11.out",)
    )
    got = np.asarray(out["captured"]["layers_11.out"])
    # reference seq layout is token-major [n, bs, d]; ours is [bs, n, d]
    want = grabbed["out"].numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # a mismatched head WITHOUT lax_names is a hard error
    with pytest.raises(ValueError, match="cls_head"):
        load_pretrain_into(init, path, lax_names=[], num_layers=12)
