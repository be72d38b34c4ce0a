"""CLI surface tests: arg parsing, encode-layer parsing, overrides, and a
subprocess smoke run of the backbone worker on a tiny synthetic config."""

import json
import os
import subprocess
import sys

import pytest
import yaml

from schemanet_tpu.cli import build_parser, parse_encode_layer


def test_parse_encode_layer():
    assert parse_encode_layer("module.transformer.layers.9") == 9
    assert parse_encode_layer("transformer.layers.11") == 11
    assert parse_encode_layer(7) == 7
    with pytest.raises(ValueError):
        parse_encode_layer("no.numbers.here")


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(
        ["train", "--cfg", "x.yaml", "--worker", "schema_net_worker",
         "--mesh-data", "4", "--mesh-model", "2", "-o", "training.batch_size=8"]
    )
    assert args.worker == "schema_net_worker"
    assert args.mesh_data == 4 and args.mesh_model == 2
    assert args.override == ["training.batch_size=8"]
    args = p.parse_args(["extract", "--cfg", "c.yaml", "--ckpt", "k", "--save-path", "s"])
    assert args.command == "extract"


def test_override_parsing():
    from schemanet_tpu.utils.config import apply_overrides, parse_override_strings

    cfg = {"training": {"batch_size": 64, "optimizer": {"lr": 1e-4}}}
    over = parse_override_strings(["training.batch_size=8", "training.optimizer.lr=0.01"])
    out = apply_overrides(cfg, over)
    assert out["training"]["batch_size"] == 8
    assert out["training"]["optimizer"]["lr"] == 0.01
    assert cfg["training"]["batch_size"] == 64  # original untouched


def test_override_list_index():
    # integer path segments index into lists — lets the CLI target one param
    # group: training.param_groups.0.cfg.nu_dtype=bfloat16
    from schemanet_tpu.utils.config import apply_overrides, parse_override_strings

    cfg = {
        "training": {
            "param_groups": [
                {"pattern": "schema_net", "cfg": {"weight_decay": 0.0005}},
                {"pattern": "matcher"},
            ]
        }
    }
    over = parse_override_strings(
        ["training.param_groups.0.cfg.nu_dtype=bfloat16",
         "training.param_groups.1.pattern=matcher2"]
    )
    out = apply_overrides(cfg, over)
    assert out["training"]["param_groups"][0]["cfg"]["nu_dtype"] == "bfloat16"
    assert out["training"]["param_groups"][0]["cfg"]["weight_decay"] == 0.0005
    assert out["training"]["param_groups"][1]["pattern"] == "matcher2"
    assert "nu_dtype" not in cfg["training"]["param_groups"][0]["cfg"]


@pytest.mark.parametrize("worker", ["backbone_worker"])
def test_cli_train_smoke(tmp_path, worker):
    cfg = {
        "dataset": {
            "name": "synthetic", "root": "", "train": {"split": "train"},
            "val": {"split": "val"}, "resize": 16, "num_classes": 3,
            "num_samples": 24, "image_size": 16,
        },
        "training": {
            "optimizer": {"name": "AdamW", "lr": 1e-3},
            "lr_schedule": {"name": "cosine_annealing", "T_max": 1},
            "train_epochs": 1, "print_interval": 1, "val_interval": 1000,
            "batch_size": 8, "num_workers": 1,
        },
        "validation": {"batch_size": 8, "num_workers": 1},
        "model": {
            "name": "vit",
            "transformer": {"embed_dim": 16, "num_encoder_layers": 2, "num_heads": 2,
                            "dim_feedforward": 32, "dropout": None, "activation": "gelu",
                            "final_norm": True, "norm_eps": 1e-6},
            "patch_embed": {"img_size": 16, "patch_size": 8, "image_channels": 3},
            "pos_encoding": {"name": "learnable"},
        },
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from schemanet_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))",
         "train", "--cfg", str(cfg_path), "--worker", worker,
         "--log-dir", str(tmp_path / "run"), "--seed", "0"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (tmp_path / "run" / "ckpt").is_dir()


def test_cli_full_stage_chain(tmp_path):
    """extract -> export -> init through the actual CLI entry points."""
    ds_cfg = {
        "name": "synthetic", "root": "", "train": {"split": "train"},
        "val": {"split": "val"}, "resize": 16, "num_classes": 3,
        "num_samples": 32, "image_size": 16,
    }
    model_block = {
        "name": "vit",
        "transformer": {"embed_dim": 16, "num_encoder_layers": 2, "num_heads": 2,
                        "dim_feedforward": 32, "dropout": None, "activation": "gelu",
                        "final_norm": True, "norm_eps": 1e-6},
        "patch_embed": {"img_size": 16, "patch_size": 8, "image_channels": 3},
        "pos_encoding": {"name": "learnable"},
    }
    # train a backbone ckpt first (in-process worker; CLI train is covered above)
    from schemanet_tpu.train.workers import LaunchArgs, WORKER_REGISTRY

    train_cfg = {
        "dataset": ds_cfg,
        "training": {"optimizer": {"name": "AdamW", "lr": 1e-3},
                     "lr_schedule": {"name": "constant"}, "train_epochs": 1,
                     "print_interval": 100, "val_interval": 1000,
                     "batch_size": 8, "num_workers": 1},
        "validation": {"batch_size": 8, "num_workers": 1},
        "model": model_block,
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }
    WORKER_REGISTRY.get("backbone_worker")(
        train_cfg, LaunchArgs(seed=0, log_dir=str(tmp_path / "vanilla"))
    )
    ckpt = str(tmp_path / "vanilla" / "ckpt" / "best")

    ing_cfg = {
        "dataset": ds_cfg,
        "discretization": {
            "vocabulary": {"size": 8, "dim": 16, "detach_input_seq": True,
                           "uniform_range": [0, 1]},
            "encoder_layer": "module.transformer.layers.1",
        },
        "model": {"model": model_block},
    }
    ing_path = tmp_path / "ing.yaml"
    # model key normally references a file; write one
    model_file = tmp_path / "model.yaml"
    model_file.write_text(yaml.safe_dump({"model": model_block}))
    ing_cfg["model"] = str(model_file)
    ing_path.write_text(yaml.safe_dump(ing_cfg))

    from schemanet_tpu.cli import main

    save_path = str(tmp_path / "ingredient")
    assert main(["extract", "--cfg", str(ing_path), "--ckpt", ckpt,
                 "--save-path", save_path, "--max-features", "512",
                 "--batch-size", "8", "--log-dir", str(tmp_path / "logs")]) == 0
    vocab = os.path.join(save_path, "cluster_8_from_512.npy")
    assert os.path.isfile(vocab)

    bundle = str(tmp_path / "bundle")
    assert main(["export", "--cfg", str(ing_path), "--ckpt", ckpt,
                 "--vocabulary-fp", vocab, "--save-path", bundle,
                 "--num-classes", "3", "--log-dir", str(tmp_path / "logs")]) == 0
    assert os.path.isfile(os.path.join(bundle, "manifest.json"))

    schema_cfg = {
        "dataset": ds_cfg,
        "schema_net": {
            "bundle": bundle,
            "matcher": {"similarity": "inner_product"},
            "gnn": {"embed_dim": 8, "num_layers": 2, "activation": "relu"},
            "ir_atlas": {"class_max_vertices": 4, "feat_h": 2, "feat_w": 2,
                         "clamp_vertex_attn": -1.0, "clamp_edge_attn": -1.0,
                         "prune_node_threshold": 0.001},
        },
    }
    schema_path = tmp_path / "schema.yaml"
    schema_path.write_text(yaml.safe_dump(schema_cfg))
    init_fp = str(tmp_path / "init.msgpack")
    assert main(["init", "--cfg", str(schema_path), "--save-fp", init_fp,
                 "--batch-size", "8", "--log-dir", str(tmp_path / "logs")]) == 0
    from schemanet_tpu.pipeline.bundle import load_atlas_init

    atlas = load_atlas_init(init_fp)
    assert atlas["params"]["vertex_weights"].shape == (3, 4)


def test_override_through_subconfig_path_reference(tmp_path):
    """A dotted override may descend through a `dataset:`/`model:` YAML path
    reference — the reference is resolved inline (and `model:`-style wrapper
    keys unwrapped) before the leaf is set."""
    from schemanet_tpu.utils.config import apply_overrides, parse_override_strings

    (tmp_path / "ds.yaml").write_text("name: synthetic\nnum_classes: 10\n")
    (tmp_path / "mdl.yaml").write_text("model:\n  name: vit\n  transformer:\n    embed_dim: 192\n")
    cfg = {"dataset": "ds.yaml", "model": "mdl.yaml", "training": {"batch_size": 64}}

    out = apply_overrides(
        cfg,
        parse_override_strings(
            ["dataset.num_classes=4", "model.transformer.embed_dim=32", "training.batch_size=8"]
        ),
        base_dir=str(tmp_path),
    )
    assert out["dataset"]["num_classes"] == 4
    assert out["dataset"]["name"] == "synthetic"  # rest of the file kept
    assert out["model"]["transformer"]["embed_dim"] == 32  # wrapper unwrapped
    assert out["model"]["name"] == "vit"
    assert out["training"]["batch_size"] == 8
    assert cfg["dataset"] == "ds.yaml"  # input untouched (copy semantics)
