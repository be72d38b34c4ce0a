"""Launcher CLI (replaces reference ``dist_engine.py`` + the per-stage scripts).

The reference spawns one process per GPU with torch.multiprocessing + NCCL;
under single-controller JAX one process drives all local chips, and multi-host
jobs call ``jax.distributed.initialize`` (one line). Everything else is flags.

Subcommands (the reference's 5-stage pipeline + serving):
    train    --worker {backbone_worker, schema_net_worker, eval_worker}
    extract  (stage 1: codebook k-means)            [scripts/extract_ingredients.py]
    export   (stage 2: export bundle)               [scripts/save_backbone_jit.py]
    init     (stage 3: IR-Atlas initialisation)     [scripts/init_schema_net.py]
    serve    (microbatched predict/explain — net-new vs the reference)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Any, Dict

import numpy as np


def _common_flags(p: argparse.ArgumentParser):
    p.add_argument("--cfg-filepath", "--cfg", dest="cfg", type=str, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-dir", type=str, default="run/exp")
    p.add_argument("--file-name-cfg", type=str, default="exp")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--mesh-data", type=int, default=None, help="data-parallel axis size")
    p.add_argument("--mesh-model", type=int, default=1, help="model-parallel axis size")
    p.add_argument("--multi-host", action="store_true", help="call jax.distributed.initialize()")
    p.add_argument(
        "--override", "-o", action="append", default=[],
        help="dotted-path config override key=value (repeatable)",
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("schemanet-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="run a training/eval worker")
    _common_flags(p_train)
    p_train.add_argument(
        "--worker", type=str, default="backbone_worker",
        choices=["backbone_worker", "schema_net_worker", "eval_worker"],
    )
    p_train.add_argument("--resume", type=str, default="",
                     help="checkpoint tag/path, or 'auto' for the latest")

    p_extract = sub.add_parser("extract", help="stage 1: extract ingredient codebook")
    _common_flags(p_extract)
    p_extract.add_argument("--ckpt", type=str, required=True, help="backbone ckpt dir or bundle")
    p_extract.add_argument("--save-path", type=str, required=True)
    p_extract.add_argument("--max-features", type=int, default=1_000_000)
    p_extract.add_argument("--batch-size", type=int, default=64)
    p_extract.add_argument("--save-features", action="store_true", help="also dump saved_features.h5")
    p_extract.add_argument("--saved-features-fp", type=str, default=None)
    p_extract.add_argument("--dtype", type=str, default="float32",
                           help="backbone compute dtype (bfloat16 for speed; fp32 = reference parity)")
    p_extract.add_argument("--quant-int8", action="store_true",
                           help="W8A8 PTQ backbone forward (2x MXU rate on v5e; ops/quant.py)")

    p_export = sub.add_parser("export", help="stage 2: export frozen bundle")
    _common_flags(p_export)
    p_export.add_argument("--ckpt", type=str, required=True)
    p_export.add_argument("--vocabulary-fp", type=str, required=True)
    p_export.add_argument("--save-path", type=str, required=True)
    p_export.add_argument("--num-classes", type=int, required=True)

    p_init = sub.add_parser("init", help="stage 3: initialise IR-Atlas")
    _common_flags(p_init)
    p_init.add_argument("--save-fp", type=str, required=True)
    p_init.add_argument("--batch-size", type=int, default=32)
    p_init.add_argument("--make-partial", type=float, default=None)

    p_serve = sub.add_parser(
        "serve", help="microbatched inference + interpretability (serve.py)"
    )
    _common_flags(p_serve)
    p_serve.add_argument("--ckpt", type=str, required=True,
                         help="trained schema_net checkpoint dir")
    p_serve.add_argument("--images", type=str, required=True,
                         help=".npy [N,H,W,3] array, an image file, a directory "
                              "of images, or 'synthetic:N'")
    p_serve.add_argument("--microbatch", type=int, default=64)
    p_serve.add_argument("--quant-int8", action="store_true",
                         help="W8A8 PTQ backbone (ops/quant.py)")
    p_serve.add_argument("--explain", action="store_true",
                         help="also compute attribution maps / instance graphs")
    p_serve.add_argument("--graph-sample", type=int, default=None,
                         help="export sample's instance graph as GraphML (needs --out)")
    p_serve.add_argument("--out", type=str, default=None,
                         help="write logits (+ explain bundle) to this .npz")
    p_serve.add_argument("--topk", type=int, default=5)
    return parser


def _setup(args) -> Dict[str, Any]:
    from .utils.config import apply_overrides, get_cfg, parse_override_strings
    from .utils.logging_utils import setup_logger

    if args.multi_host:
        import jax

        jax.distributed.initialize()
    setup_logger(os.path.join(args.log_dir, "logs"), f"{args.file_name_cfg}.log")
    cfg = get_cfg(args.cfg)
    cfg = apply_overrides(
        cfg,
        parse_override_strings(args.override),
        base_dir=os.path.dirname(os.path.abspath(args.cfg)),
    )
    # kernels: backend/variant policy (ops/policy.py) — applies to every
    # subcommand so extract/init/export/serve run the same tuned defaults
    from .ops.policy import configure

    configure(cfg.get("kernels"))
    return cfg


def _launch_args(args, resume: str = ""):
    from .train.workers import LaunchArgs

    return LaunchArgs(
        seed=args.seed,
        debug=args.debug,
        log_dir=args.log_dir,
        file_name=args.file_name_cfg,
        resume=resume,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        base_dir=os.path.dirname(os.path.abspath(args.cfg)),
    )


def _load_backbone_for_stage(cfg, args):
    """Build model + load the fine-tuned backbone ckpt for extract/export."""
    import jax
    import jax.numpy as jnp

    from .models.vit import get_model
    from .train.common import CheckpointManager
    from .utils.config import resolve_subconfig

    base_dir = os.path.dirname(os.path.abspath(args.cfg))
    data_cfg = resolve_subconfig(cfg["dataset"], base_dir)
    model_cfg = cfg.get("model")
    if isinstance(model_cfg, str):
        model_cfg = resolve_subconfig(model_cfg, base_dir)["model"]
    n_classes = cfg.get("num_classes") or getattr(args, "num_classes", None)
    if n_classes is None:
        from .data.datasets import get_dataset

        n_classes = get_dataset(data_cfg, "train").num_classes
    from .train.workers import resolve_dtype

    model = get_model(model_cfg, n_classes, dtype=resolve_dtype(getattr(args, "dtype", None)))
    dummy = jnp.zeros((1, model.img_size, model.img_size, model.image_channels), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    ckpt_path = os.path.abspath(os.path.expanduser(args.ckpt))
    if os.path.isdir(ckpt_path):
        mgr = CheckpointManager(os.path.dirname(ckpt_path))
        restored = mgr.restore(ckpt_path)  # template-free: partial consumption
        params = restored["params"]
    elif ckpt_path.endswith((".pth", ".pt")):
        from .models.port import load_pretrain_into

        params = load_pretrain_into(params, ckpt_path, num_layers=model.num_encoder_layers)
    else:
        raise FileNotFoundError(ckpt_path)
    return model, params, model_cfg, data_cfg


def cmd_train(args):
    from .train.workers import WORKER_REGISTRY

    cfg = _setup(args)
    worker = WORKER_REGISTRY.get(args.worker)
    result = worker(cfg, _launch_args(args, args.resume))
    if isinstance(result, dict) and "eval" in result:
        logging.getLogger("cli").info("final eval: %s", result["eval"].get("acc"))
    elif isinstance(result, dict):
        # eval_worker returns the metrics dict directly — print it
        logging.getLogger("cli").info(
            "eval result: %s",
            {k: v for k, v in result.items() if not k.startswith("_")},
        )
    return 0


def _stage_mesh(args):
    """Data-parallel mesh for the pipeline stages (1/3) — the reference runs
    these single-GPU by construction; here they ride the same mesh as
    training. None on a single chip with no explicit request (identical
    single-device program to before)."""
    import jax

    if args.mesh_data is None and args.mesh_model == 1 and jax.device_count() == 1:
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(data=args.mesh_data, model=args.mesh_model)


def cmd_extract(args):
    from .data.datasets import get_dataset
    from .data.loader import DataLoader
    from .pipeline.extract_ingredients import cluster_saved_features, extract_codebook
    from .utils.config import resolve_subconfig

    cfg = _setup(args)
    num_clusters = cfg["discretization"]["vocabulary"]["size"]
    os.makedirs(args.save_path, exist_ok=True)

    if args.saved_features_fp:
        centers = cluster_saved_features(args.saved_features_fp, num_clusters, seed=args.seed)
        n_feats = "h5"
    else:
        model, params, model_cfg, data_cfg = _load_backbone_for_stage(cfg, args)
        encode_layer = parse_encode_layer(cfg["discretization"]["encoder_layer"])
        train_set = get_dataset(data_cfg, "train")
        loader = DataLoader(
            train_set, batch_size=args.batch_size, split="train", seed=args.seed,
            resize=data_cfg.get("resize"),
        )
        centers = extract_codebook(
            model, params, loader, encode_layer, num_clusters,
            max_features=args.max_features,
            save_features_path=(
                os.path.join(args.save_path, "saved_features.h5") if args.save_features else None
            ),
            seed=args.seed,
            mesh=_stage_mesh(args),
            quant=args.quant_int8,
        )
        n_feats = args.max_features
    save_fp = os.path.join(args.save_path, f"cluster_{num_clusters}_from_{n_feats}.npy")
    np.save(save_fp, centers)
    try:  # also save a torch-compatible .pth like the reference artifact
        import torch

        torch.save(torch.from_numpy(centers), save_fp.replace(".npy", ".pth"))
    except ImportError:
        pass
    print(f"saved codebook to {save_fp}")
    return 0


def cmd_export(args):
    from .pipeline.bundle import save_bundle

    cfg = _setup(args)
    model, params, model_cfg, _ = _load_backbone_for_stage(cfg, args)
    encode_layer = parse_encode_layer(cfg["discretization"]["encoder_layer"])
    vocab_fp = os.path.expanduser(args.vocabulary_fp)
    if vocab_fp.endswith(".npy"):
        codebook = np.load(vocab_fp)
    else:
        import torch

        codebook = torch.load(vocab_fp, map_location="cpu").numpy()
    size = cfg["discretization"]["vocabulary"]["size"]
    if codebook.shape[0] > size:  # random subsample (discretization.py:40-48)
        rng = np.random.default_rng(args.seed)
        codebook = codebook[rng.permutation(codebook.shape[0])[:size]]
    save_bundle(args.save_path, model_cfg, encode_layer, params, codebook,
                extra={"discretization": cfg["discretization"]})
    print(f"saved bundle to {args.save_path}")
    return 0


def cmd_init(args):
    import jax

    from .data.datasets import get_dataset
    from .data.loader import DataLoader
    from .pipeline.bundle import load_bundle, save_atlas_init
    from .pipeline.init_schema_net import init_atlas
    from .schema.atlas import AtlasConfig
    from .schema.predictor import IngredientBackbone
    from .models.vit import get_model
    from .utils.config import resolve_subconfig

    cfg = _setup(args)
    base_dir = os.path.dirname(os.path.abspath(args.cfg))
    data_cfg = dict(resolve_subconfig(cfg["dataset"], base_dir))
    if args.make_partial:
        data_cfg["make_partial"] = args.make_partial
    schema_cfg = cfg["schema_net"]
    bundle = load_bundle(schema_cfg["bundle"])
    train_set = get_dataset(data_cfg, "train")
    loader = DataLoader(
        train_set, batch_size=args.batch_size, split="train", seed=args.seed,
        resize=data_cfg.get("resize"),
    )
    model = get_model(bundle.model_cfg, train_set.num_classes)
    atlas_cfg = AtlasConfig.from_cfg(
        num_vertices=bundle.codebook.shape[0],
        num_classes=train_set.num_classes,
        ir_atlas_cfg=schema_cfg.get("ir_atlas", {}),
    )
    ib = IngredientBackbone(
        backbone=model,
        num_codes=bundle.codebook.shape[0],
        code_dim=bundle.codebook.shape[1],
        encode_layer=bundle.encode_layer,
    )
    ib_vars = {"params": {"backbone": bundle.backbone_params, "vocabulary": bundle.codebook}}
    atlas_init = init_atlas(
        lambda img: ib.apply(ib_vars, img),
        loader,
        atlas_cfg,
        accumulate_compat=bool(
            schema_cfg.get("ir_atlas", {}).get("init_accumulate_compat", False)
        ),
        compat_seed=args.seed,
        mesh=_stage_mesh(args),
    )
    save_atlas_init(args.save_fp, atlas_init["params"], atlas_init["class_ingredients"])
    print(f"saved initial IR-Atlas to {args.save_fp}")
    return 0


def _load_serve_images(spec: str, img_size: int) -> np.ndarray:
    """--images: 'synthetic:N' | .npy array | image file | directory."""
    if spec.startswith("synthetic:"):
        n = int(spec.split(":", 1)[1])
        rng = np.random.default_rng(0)
        return rng.normal(size=(n, img_size, img_size, 3)).astype(np.float32)
    path = os.path.expanduser(spec)
    if path.endswith(".npy"):
        arr = np.asarray(np.load(path), np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        return arr
    from PIL import Image

    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
        )
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    imgs = [
        np.asarray(
            Image.open(f).convert("RGB").resize((img_size, img_size)), np.float32
        )
        / 255.0
        for f in files
    ]
    return np.stack(imgs)


def cmd_serve(args):
    """Reference parity note: the reference ships NO serving path (its
    SchemaNetPredictor docstring graph/__init__.py:19-24 promises per-code
    attributions it never implements) — this surface is net-new."""
    from .pipeline.bundle import load_bundle
    from .serve import load_serve_predictor

    cfg = _setup(args)
    schema_cfg = cfg["schema_net"]
    base_dir = os.path.dirname(os.path.abspath(args.cfg))
    num_classes = cfg.get("num_classes")
    if num_classes is None:
        from .data.datasets import get_dataset
        from .utils.config import resolve_subconfig

        data_cfg = resolve_subconfig(cfg["dataset"], base_dir)
        num_classes = get_dataset(data_cfg, "train").num_classes
    bundle_path = os.path.expanduser(schema_cfg["bundle"])
    img_size = load_bundle(bundle_path).img_size
    server = load_serve_predictor(
        bundle_path, schema_cfg, args.ckpt, num_classes,
        microbatch=args.microbatch, quant_int8=args.quant_int8,
    )
    images = _load_serve_images(args.images, img_size)

    logits = server.predict(images)
    k = min(args.topk, logits.shape[1])
    order = np.argsort(-logits, axis=1)[:, :k]
    for i, row in enumerate(order):
        print(json.dumps({
            "index": i,
            "label": int(row[0]),
            "topk": [[int(c), float(logits[i, c])] for c in row],
        }))

    saved: Dict[str, Any] = {"logits": logits}
    if args.explain:
        saved.update(server.explain(images))
    if args.out:
        np.savez(os.path.expanduser(args.out), **saved)
        print(f"saved {sorted(saved)} to {args.out}")
        if args.graph_sample is not None:
            import networkx as nx

            g = server.explain_networkx(images, sample=args.graph_sample)
            graph_fp = os.path.expanduser(args.out) + f".sample{args.graph_sample}.graphml"
            nx.write_graphml(g, graph_fp)
            print(f"saved instance graph to {graph_fp}")
    return 0


def parse_encode_layer(encoder_layer_cfg: str) -> int:
    """'module.transformer.layers.9' -> 9 (ingredient yaml encoder_layer)."""
    if isinstance(encoder_layer_cfg, int):
        return encoder_layer_cfg
    parts = str(encoder_layer_cfg).split(".")
    for token in reversed(parts):
        if token.isdigit():
            return int(token)
    raise ValueError(f"cannot parse encode layer from {encoder_layer_cfg!r}")


def main(argv=None) -> int:
    # SCHEMANET_PLATFORM=cpu pins the JAX backend before first use — needed
    # because TPU plugin sitecustomize setups override the JAX_PLATFORMS env
    # var, so this config knob is the only reliable way to force a CPU run
    # (e.g. smoke-testing pipeline mechanics on a host whose chip is busy).
    platform = os.environ.get("SCHEMANET_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    args = build_parser().parse_args(argv)
    return {
        "train": cmd_train,
        "extract": cmd_extract,
        "export": cmd_export,
        "init": cmd_init,
        "serve": cmd_serve,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
