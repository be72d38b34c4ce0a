"""End-to-end 5-stage pipeline on synthetic data (tiny model, CPU mesh):
backbone train -> codebook extraction -> bundle export -> atlas init ->
SchemaNet train -> eval (incl. CB agreement). The integration-level analogue of
running the reference's 0..4 shell scripts."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.data.datasets import get_dataset
from schemanet_tpu.data.loader import DataLoader
from schemanet_tpu.models.vit import get_model
from schemanet_tpu.pipeline import (
    extract_codebook,
    init_atlas,
    load_atlas_init,
    load_bundle,
    save_atlas_init,
    save_bundle,
)
from schemanet_tpu.schema.atlas import AtlasConfig
from schemanet_tpu.train.workers import LaunchArgs, WORKER_REGISTRY

MODEL_CFG = {
    "name": "vit",
    "transformer": {
        "embed_dim": 32,
        "num_encoder_layers": 3,
        "num_heads": 2,
        "dim_feedforward": 64,
        "dropout": 0.1,
        "activation": "gelu",
        "final_norm": True,
        "norm_eps": 1e-6,
    },
    "patch_embed": {"img_size": 16, "patch_size": 4, "image_channels": 3},
    "pos_encoding": {"name": "learnable"},
}
DATA_CFG = {
    "name": "synthetic",
    "root": "",
    "train": {"split": "train"},
    "val": {"split": "val"},
    "resize": 16,
    "num_classes": 4,
    "num_samples": 64,
    "image_size": 16,
}
ENCODE_LAYER = 1
M = 16


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("pipeline")


@pytest.fixture(scope="module")
def stages(workdir):
    """Run stages 0-3 once; individual tests assert on the artifacts."""
    # ---- stage 0: backbone fine-tune (2 epochs from scratch) ---------------
    cfg = {
        "dataset": DATA_CFG,
        "training": {
            "optimizer": {"name": "AdamW", "lr": 1e-3, "weight_decay": 0.05},
            "lr_schedule": {"name": "cosine_annealing", "T_max": 2, "warmup_iters": 1},
            "train_epochs": 2,
            "print_interval": 100,
            "val_interval": 10_000,
            "batch_size": 16,
            "num_workers": 2,
            "clip_max_norm": 0.1,
        },
        "validation": {"batch_size": 16, "num_workers": 2},
        "model": MODEL_CFG,
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }
    args = LaunchArgs(seed=0, log_dir=str(workdir / "vanilla"))
    result = WORKER_REGISTRY.get("backbone_worker")(cfg, args)
    trainer = result["trainer"]
    model = result["model"]
    backbone_params = jax.device_get(trainer.state.params)

    # ---- stage 1: codebook extraction --------------------------------------
    train_set = get_dataset(DATA_CFG, "train")
    loader = DataLoader(train_set, batch_size=16, split="train", seed=0, resize=16,
                        num_workers=2)
    codebook = extract_codebook(
        model, backbone_params, loader, ENCODE_LAYER, num_clusters=M,
        max_features=2048, lloyd_iters=3,
    )

    # ---- stage 2: bundle export ---------------------------------------------
    bundle_path = str(workdir / "bundle")
    save_bundle(bundle_path, MODEL_CFG, ENCODE_LAYER, backbone_params, codebook)

    # ---- stage 3: atlas init -------------------------------------------------
    bundle = load_bundle(bundle_path)
    atlas_cfg = AtlasConfig(
        num_vertices=M, num_classes=4, class_max_vertices=8,
        feat_h=4, feat_w=4, clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
        prune_node_threshold=0.001,
    )
    from schemanet_tpu.schema.predictor import IngredientBackbone

    ib = IngredientBackbone(
        backbone=model, num_codes=M, code_dim=32, encode_layer=ENCODE_LAYER
    )
    ib_vars = {
        "params": {
            "backbone": bundle.backbone_params,
            "vocabulary": bundle.codebook,
        }
    }

    def ingredient_apply(image):
        return ib.apply(ib_vars, image)

    atlas_init = init_atlas(ingredient_apply, loader, atlas_cfg)
    init_fp = str(workdir / "init_atlas.msgpack")
    save_atlas_init(init_fp, atlas_init["params"], atlas_init["class_ingredients"])

    return {
        "workdir": workdir,
        "bundle_path": bundle_path,
        "init_fp": init_fp,
        "atlas_cfg": atlas_cfg,
        "backbone_result": result,
        "codebook": codebook,
        "atlas_init": atlas_init,
    }


def test_stage0_backbone_trained(stages):
    res = stages["backbone_result"]
    assert res["eval"]["acc"][1] > 0.3  # synthetic classes are separable
    # checkpoints written
    assert os.path.isdir(os.path.join(stages["workdir"], "vanilla", "ckpt", "best"))


def test_stage1_codebook(stages):
    cb = stages["codebook"]
    assert cb.shape == (M, 32)
    assert np.isfinite(cb).all()
    # centers are not collapsed
    assert np.unique(cb.round(4), axis=0).shape[0] > M // 2


def test_stage3_atlas_init(stages):
    init = stages["atlas_init"]
    vw = init["params"]["vertex_weights"]
    ew = init["params"]["edge_weights"]
    assert vw.shape == (4, 8) and ew.shape == (4, 8, 8)
    # projection applied: rows sum to 1 (or 0 for empty)
    sums = vw.sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    ci = init["class_ingredients"]
    assert ci.shape == (4, 8)
    # class vertex ids are distinct per class (topk indices)
    for row in ci:
        assert len(set(row.tolist())) == len(row)


def test_stage4_schema_train_and_eval(stages):
    cfg = {
        "dataset": DATA_CFG,
        "training": {
            "optimizer": {"name": "AdamW", "lr": 1e-3, "weight_decay": 0.05},
            "param_groups": [
                {"pattern": "schema_net", "cfg": {"weight_decay": 5.0e-4}},
                {"pattern": "matcher"},
            ],
            "drop_remain": True,
            "lr_schedule": {"name": "cosine_annealing", "T_max": 2, "eta_min": 1e-5},
            "train_epochs": 2,
            "print_interval": 100,
            "val_interval": 10_000,
            "batch_size": 16,
            "num_workers": 2,
        },
        "validation": {"batch_size": 16, "num_workers": 2},
        "schema_net": {
            "bundle": stages["bundle_path"],
            "initial_state_fp": stages["init_fp"],
            "matcher": {"similarity": "inner_product"},
            "gnn": {"embed_dim": 16, "num_layers": 2, "activation": "relu"},
            "ir_atlas": {
                "class_max_vertices": 8,
                "dist_pow": 2,
                "feat_h": 4,
                "feat_w": 4,
                "clamp_vertex_attn": -1.0,
                "clamp_edge_attn": -1.0,
                "remove_self_loop": False,
                "prune_node_threshold": 0.001,
            },
        },
        "loss": {
            "name": "schema_inference_loss",
            "weight_dict": {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75},
        },
    }
    args = LaunchArgs(seed=0, log_dir=str(stages["workdir"] / "schema"))
    result = WORKER_REGISTRY.get("schema_net_worker")(cfg, args)
    trainer = result["trainer"]

    # frozen backbone params unchanged after training
    bundle = load_bundle(stages["bundle_path"])
    trained_bb = jax.device_get(trainer.full_params["backbone"])
    ref_leaf = bundle.backbone_params["cls_token"]
    np.testing.assert_allclose(np.asarray(trained_bb["cls_token"]), np.asarray(ref_leaf))
    cb_after = jax.device_get(trainer.full_params["ingredient_backbone"]["vocabulary"])
    np.testing.assert_allclose(np.asarray(cb_after), stages["codebook"], atol=1e-6)

    # atlas was actually trained (changed from init)
    init = load_atlas_init(stages["init_fp"])
    vw_trained = np.asarray(trainer.state.params["schema_net"]["vertex_weights"])
    assert not np.allclose(vw_trained, init["params"]["vertex_weights"])

    # atlas rows remain normalised post-projection in eval
    assert result["eval"]["acc"][1] >= 0.0  # pipeline runs to completion

    # eval worker incl. CB agreement
    eval_cfg = dict(cfg)
    args2 = LaunchArgs(seed=0, log_dir=str(stages["workdir"] / "eval"))
    eval_result = WORKER_REGISTRY.get("eval_worker")(eval_cfg, args2)
    assert {"acc", "acc_model", "acc_origin"} <= set(eval_result["cb"].keys())
    assert 0.0 <= eval_result["cb"]["acc_model"] <= 1.0


def test_serve_from_trained_checkpoint(stages, workdir):
    """load_serve_predictor over the artifacts from stages 2-4 (the deployment
    path: bundle + trained schema ckpt -> microbatched inference)."""
    from schemanet_tpu.serve import load_serve_predictor

    ckpt_dir = os.path.join(workdir, "schema", "ckpt", "best")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("stage 4 checkpoint missing (run test_stage4 first)")
    schema_cfg = {
        "matcher": {"similarity": "inner_product"},
        "gnn": {"embed_dim": 16, "num_layers": 2, "activation": "relu"},
        "ir_atlas": {"class_max_vertices": 8, "feat_h": 4, "feat_w": 4,
                     "clamp_vertex_attn": -1.0, "clamp_edge_attn": -1.0,
                     "prune_node_threshold": 0.001},
    }
    server = load_serve_predictor(
        stages["bundle_path"], schema_cfg, ckpt_dir, num_classes=4, microbatch=4
    )
    rng = np.random.default_rng(3)
    images = rng.normal(size=(6, 16, 16, 3)).astype(np.float32)
    logits = server.predict(images)
    assert logits.shape == (6, 4) and np.isfinite(logits).all()
    res = server.explain(images[:2])
    assert res["attribution"].shape == (2, 4, 4, 4)


def test_resume_roundtrip(stages, workdir):
    """Checkpoint resume restores params exactly (worker.py:92-117 contract)."""
    from schemanet_tpu.train.common import CheckpointManager

    ckpt_dir = os.path.join(workdir, "vanilla", "ckpt")
    trainer = stages["backbone_result"]["trainer"]
    mgr = CheckpointManager(ckpt_dir)
    template = {
        "params": jax.device_get(trainer.full_params),
        "buffers": {},
        "opt_state": jax.device_get(trainer.state.opt_state),
        "step": np.zeros((), np.int32),
    }
    restored = mgr.restore("best", template)
    assert int(restored["step"]) > 0


def test_h5_feature_dump_and_resume(stages, tmp_path):
    """--save-features h5 dump + cluster_saved_features resume path
    (reference extract_ingredients --saved_features_fp)."""
    h5py = pytest.importorskip("h5py")
    from schemanet_tpu.pipeline import cluster_saved_features, extract_codebook

    model = stages["backbone_result"]["model"]
    params = jax.device_get(stages["backbone_result"]["trainer"].state.params)
    train_set = get_dataset(DATA_CFG, "train")
    loader = DataLoader(train_set, batch_size=16, split="train", seed=0, resize=16,
                        num_workers=1)
    h5_path = str(tmp_path / "saved_features.h5")
    cb1 = extract_codebook(
        model, params, loader, ENCODE_LAYER, num_clusters=8,
        max_features=512, lloyd_iters=2, save_features_path=h5_path,
    )
    with h5py.File(h5_path) as f:
        assert f["features"].shape == (512, 32)
    cb2 = cluster_saved_features(h5_path, num_clusters=8, lloyd_iters=2)
    assert cb1.shape == cb2.shape == (8, 32)
    assert np.isfinite(cb2).all()


def test_cli_serve_smoke(stages, workdir, tmp_path, capsys):
    """`schemanet-tpu serve` over the stage-2/4 artifacts: topk JSON lines on
    stdout, logits + explain bundle in the .npz, GraphML export."""
    import json

    import yaml

    from schemanet_tpu.cli import main

    ckpt_dir = os.path.join(workdir, "schema", "ckpt", "best")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("stage 4 checkpoint missing (run test_stage4 first)")
    cfg = {
        "dataset": DATA_CFG,
        "schema_net": {
            "bundle": stages["bundle_path"],
            "matcher": {"similarity": "inner_product"},
            "gnn": {"embed_dim": 16, "num_layers": 2, "activation": "relu"},
            "ir_atlas": {"class_max_vertices": 8, "feat_h": 4, "feat_w": 4,
                         "clamp_vertex_attn": -1.0, "clamp_edge_attn": -1.0,
                         "prune_node_threshold": 0.001},
        },
    }
    cfg_path = tmp_path / "serve.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_fp = str(tmp_path / "serve_out.npz")
    rc = main([
        "serve", "--cfg", str(cfg_path), "--ckpt", ckpt_dir,
        "--images", "synthetic:5", "--microbatch", "4", "--explain",
        "--out", out_fp, "--graph-sample", "0", "--topk", "3",
        "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [json.loads(l) for l in lines[:5]]
    assert len(rows) == 5 and all(len(r["topk"]) == 3 for r in rows)
    saved = np.load(out_fp)
    assert saved["logits"].shape == (5, 4)
    assert saved["attribution"].shape == (5, 4, 4, 4)
    assert os.path.isfile(out_fp + ".sample0.graphml")
