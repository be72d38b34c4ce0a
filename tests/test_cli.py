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
