"""Worker entry points (reference ``dist_engine.py:39-43`` registry:
backbone_worker, schema_net_worker, eval_worker).

Each worker assembles data + model + optimizer + trainer from the same YAML
config families as the reference (``config/<dataset>/{vanilla,ingredient,
schema_net}``). The multi-process launcher collapses into a function call —
distribution comes from the mesh, not from process spawning.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loaders
from ..models.port import load_pretrain_into
from ..models.vit import get_model
from ..parallel.mesh import batch_sharding, make_mesh
from ..schema.atlas import project_atlas_params
from ..schema.loss import get_loss_fn
from ..schema.predictor import build_predictor
from ..utils.config import resolve_subconfig
from ..utils.registry import Registry
from .common import CheckpointManager
from .evaluator import CBEvaluation, Evaluation
from .trainer import Trainer, TrainerConfig

WORKER_REGISTRY: Registry = Registry("workers")

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class LaunchArgs:
    """Reference DistLaunchArgs/LogArgs equivalents (utils/dist_utils.py)."""

    seed: int = 42
    debug: bool = False
    log_dir: str = "run"
    file_name: str = "exp"
    resume: str = ""
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    base_dir: Optional[str] = None  # for resolving config path refs


def _apply_debug_overrides(train_cfg, val_cfg, debug: bool):
    if debug:  # dist_engine --debug semantics (worker.py:292-296)
        train_cfg = dict(train_cfg, num_workers=0, print_interval=1, val_interval=10)
        val_cfg = dict(val_cfg, num_workers=0)
    return train_cfg, val_cfg


def _make_mesh(args: LaunchArgs):
    return make_mesh(data=args.mesh_data, model=args.mesh_model)


def resolve_dtype(name) -> Any:
    """``training.dtype`` YAML knob -> compute dtype (params stay fp32).

    bf16 is the TPU-native mixed precision (no GradScaler machinery, unlike
    the reference's --use-amp fp16 path, worker.py:84-88); fp32 is the
    default for exact-parity runs."""
    if name in (None, "float32", "fp32", "f32"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise KeyError(f"unknown dtype {name!r}")


def _split_cfg(global_cfg: Dict[str, Any], args: LaunchArgs):
    # kernels: backend/variant policy (ops/policy.py) — tuned defaults unless
    # the YAML (or --set kernels.<field>=…) overrides them
    from ..ops.policy import configure

    configure(global_cfg.get("kernels"))
    data_cfg = resolve_subconfig(global_cfg["dataset"], args.base_dir)
    train_cfg = dict(global_cfg.get("training", {}))
    val_cfg = dict(global_cfg.get("validation", {}))
    train_cfg, val_cfg = _apply_debug_overrides(train_cfg, val_cfg, args.debug)
    return data_cfg, train_cfg, val_cfg


@WORKER_REGISTRY.register("backbone_worker")
def backbone_worker(global_cfg: Dict[str, Any], args: LaunchArgs) -> Dict[str, Any]:
    """Fine-tune the ViT/DeiT backbone (reference tasks/worker.py)."""
    data_cfg, train_cfg, val_cfg = _split_cfg(global_cfg, args)
    model_cfg = global_cfg["model"]
    if isinstance(model_cfg, str):
        model_cfg = resolve_subconfig(model_cfg, args.base_dir).get("model", model_cfg)
    loss_cfg = global_cfg["loss"]

    train_loader, val_loader, n_classes = build_loaders(data_cfg, train_cfg, val_cfg, args.seed)
    model = get_model(model_cfg, n_classes, dtype=resolve_dtype(train_cfg.get("dtype")))

    dummy = jnp.zeros(
        (1, model.img_size, model.img_size, model.image_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(args.seed), dummy)
    params = variables["params"]
    buffers = variables.get("batch_stats", {})  # BN models (resnets)

    pretrain = model_cfg.get("pre_train")
    if pretrain and os.path.isfile(os.path.expanduser(pretrain)):
        params = load_pretrain_into(
            params,
            os.path.expanduser(pretrain),
            lax_names=model_cfg.get("lax_names"),
            num_layers=model.num_encoder_layers,
        )
        logger.info("loaded pretrain weights from %s", pretrain)
    elif pretrain:
        logger.warning("pretrain file %s not found; training from scratch", pretrain)

    def apply_fn(p, b, image, rng, train):
        rngs = {"dropout": rng} if train else None
        variables = {"params": p}
        if b:
            variables["batch_stats"] = b
        if train and b:
            out, mutated = model.apply(
                variables, image, deterministic=False, rngs=rngs, mutable=["batch_stats"]
            )
            out["__buffers__"] = mutated["batch_stats"]
            return out
        return model.apply(variables, image, deterministic=not train, rngs=rngs)

    loss_fn = get_loss_fn(loss_cfg)
    trainer = Trainer(
        cfg=TrainerConfig.from_cfg(train_cfg),
        apply_fn=apply_fn,
        loss_fn=loss_fn,
        loss_weights=loss_cfg["weight_dict"],
        params=params,
        buffers=buffers,
        train_loader=train_loader,
        val_loader=val_loader,
        mesh=_make_mesh(args),
        log_dir=os.path.join(args.log_dir, "tb"),
        ckpt_dir=os.path.join(args.log_dir, "ckpt"),
        resume=args.resume,
        seed=args.seed,
        name="backbone_trainer",
        compute_dtype=resolve_dtype(train_cfg.get("dtype")),
    )
    result = trainer()
    return {"trainer": trainer, "eval": result, "model": model}


@WORKER_REGISTRY.register("schema_net_worker")
def schema_net_worker(global_cfg: Dict[str, Any], args: LaunchArgs) -> Dict[str, Any]:
    """Train the SchemaNet predictor over a frozen ingredient backbone
    (reference tasks/worker_schema_net.py)."""
    data_cfg, train_cfg, val_cfg = _split_cfg(global_cfg, args)
    schema_cfg = global_cfg["schema_net"]
    # training defaults to bf16 MXU graph contractions (~4x on the hot path);
    # the init pipeline keeps 'highest' for CPU-reference bit-parity. A YAML
    # may pin either via schema_net.ir_atlas.graph_precision.
    ir_cfg = dict(schema_cfg.get("ir_atlas") or {})
    ir_cfg.setdefault("graph_precision", "default")
    schema_cfg = dict(schema_cfg, ir_atlas=ir_cfg)
    loss_cfg = global_cfg["loss"]
    if args.debug:
        train_cfg = dict(train_cfg, batch_size=max(jax.device_count(), 1))
        val_cfg = dict(val_cfg, batch_size=max(jax.device_count(), 1))

    train_loader, val_loader, n_classes = build_loaders(data_cfg, train_cfg, val_cfg, args.seed)

    # the export bundle replaces the reference's 4 TorchScript traces: it holds
    # the fine-tuned backbone params, the codebook, and the model/VQ config
    from ..pipeline.bundle import load_bundle

    bundle = load_bundle(schema_cfg["bundle"])
    uniform_range = tuple(
        (bundle.extra.get("discretization", {}).get("vocabulary", {}) or {}).get(
            "uniform_range", (-1.0, 1.0)
        )
    )
    # load the IR-Atlas init BEFORE building the predictor: class_ingredients
    # is a write-once buffer (stage 3 fills it; training never updates it), so
    # its host copy can be declared static to the jitted step — this turns the
    # class-embedding backward from a dynamic scatter-add into a trace-time
    # -sorted banded matmul reduction (schema/gnn.py StaticIds)
    atlas_init = None
    init_fp = schema_cfg.get("initial_state_fp")
    if init_fp and os.path.exists(os.path.expanduser(init_fp)):
        from ..pipeline.bundle import load_atlas_init

        atlas_init = load_atlas_init(os.path.expanduser(init_fp))
    predictor = build_predictor(
        model_cfg=bundle.model_cfg,
        schema_cfg=schema_cfg,
        num_classes=n_classes,
        num_codes=bundle.codebook.shape[0],
        code_dim=bundle.codebook.shape[1],
        encode_layer=bundle.encode_layer,
        uniform_range=uniform_range,
        dtype=resolve_dtype(train_cfg.get("dtype")),
        static_class_ids=(
            None if atlas_init is None else atlas_init["class_ingredients"]
        ),
    )
    dummy = jnp.zeros((1, bundle.img_size, bundle.img_size, 3), jnp.float32)
    variables = predictor.init(jax.random.PRNGKey(args.seed), dummy, method="init_full")
    params = dict(variables["params"])
    buffers = dict(variables["buffers"])
    params["backbone"] = bundle.backbone_params
    params["ingredient_backbone"] = {"vocabulary": bundle.codebook}

    if atlas_init is not None:
        params["schema_net"] = atlas_init["params"]
        buffers["schema_net"] = {"class_ingredients": atlas_init["class_ingredients"]}
        logger.info("loaded initial IR-Atlas from %s", init_fp)

    def buffer_guard(restored_buffers):
        # the apply_fn was traced with the atlas-init class_ingredients baked
        # in as a static constant; a resumed checkpoint whose buffer differs
        # would silently train with the wrong class graphs
        sid = predictor.cfg.static_class_ids
        if sid is None:
            return
        got = np.asarray(
            jax.device_get(restored_buffers["schema_net"]["class_ingredients"])
        )
        if not np.array_equal(got, sid.ids):
            raise ValueError(
                "resumed class_ingredients buffer differs from the atlas init "
                f"({init_fp}) this run was built with — refusing to continue"
            )

    atlas_cfg = predictor.cfg.atlas

    def project(p):
        return dict(p, schema_net=project_atlas_params(p["schema_net"], atlas_cfg))

    def apply_fn(p, b, image, rng, train):
        return predictor.apply({"params": p, "buffers": b}, image)

    def attr_scalars(state):
        sn = state.params["schema_net"]
        v = jax.device_get(sn["vertex_attribute_weights"])
        e = jax.device_get(sn["edge_attribute_weights"])
        return {"v_geo": float(v[0, 0]), "v_attn": float(v[1, 0]),
                "e_geo": float(e[0, 0]), "e_attn": float(e[1, 0])}

    loss_fn = get_loss_fn(loss_cfg)
    trainer = Trainer(
        cfg=TrainerConfig.from_cfg(
            train_cfg,
            frozen_patterns=(r"backbone\.", r"ingredient_backbone\."),
        ),
        apply_fn=apply_fn,
        loss_fn=loss_fn,
        loss_weights=loss_cfg["weight_dict"],
        params=params,
        buffers=buffers,
        train_loader=train_loader,
        val_loader=val_loader,
        mesh=_make_mesh(args),
        project_params=project,
        log_dir=os.path.join(args.log_dir, "tb"),
        ckpt_dir=os.path.join(args.log_dir, "ckpt"),
        resume=args.resume,
        seed=args.seed,
        extra_scalars=attr_scalars,
        buffer_guard=buffer_guard,
        name="schema_net_trainer",
        compute_dtype=resolve_dtype(train_cfg.get("dtype")),
    )
    result = trainer()
    return {"trainer": trainer, "eval": result, "predictor": predictor}


@WORKER_REGISTRY.register("eval_worker")
def eval_worker(global_cfg: Dict[str, Any], args: LaunchArgs) -> Dict[str, Any]:
    """Evaluate a trained backbone or predictor checkpoint
    (reference tasks/worker_eval.py; top-1/top-5)."""
    data_cfg, train_cfg, val_cfg = _split_cfg(global_cfg, args)
    loss_cfg = global_cfg.get("loss", {"name": "ce_loss", "weight_dict": {"cls": 1.0}})
    from ..data.loader import build_eval_loader

    val_loader, n_classes = build_eval_loader(data_cfg, val_cfg, args.seed)
    mesh = _make_mesh(args)

    if "schema_net" in global_cfg:
        out = _assemble_schema_predictor(global_cfg, args, n_classes)
        predictor, params, buffers = out

        def apply_fn(p, b, image, train=False):
            return predictor.apply({"params": p, "buffers": b}, image)

        def classify_fn(p, b, image, quantize):
            return predictor.apply(
                {"params": p, "buffers": b},
                image,
                quantize,
                method=lambda m, img, q: m.ingredient_backbone.classify_discretized(img, q),
            )

        evaluation = Evaluation(
            apply_fn, get_loss_fn(loss_cfg), loss_cfg["weight_dict"], val_loader,
            batch_sharding=batch_sharding(mesh), top_k=(1, 5),
        )
        result = evaluation(params, buffers)
        cb = CBEvaluation(classify_fn, val_loader, batch_sharding=batch_sharding(mesh))
        result["cb"] = cb(params, buffers)
        return result

    model_cfg = global_cfg["model"]
    if isinstance(model_cfg, str):
        model_cfg = resolve_subconfig(model_cfg, args.base_dir).get("model", model_cfg)
    model = get_model(model_cfg, n_classes, dtype=resolve_dtype(val_cfg.get("dtype")))
    dummy = jnp.zeros((1, model.img_size, model.img_size, model.image_channels), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    if args.resume:
        from .common import merge_restored

        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(args.resume)))
        restored = ckpt.restore(os.path.abspath(args.resume))
        # lax overlay: a checkpoint from a different class count keeps the
        # local head instead of crashing (reference utils/model.py:24-33)
        params = merge_restored(params, restored.get("params", restored))

    def apply_fn(p, b, image, train=False):
        return model.apply({"params": p}, image, deterministic=True)

    evaluation = Evaluation(
        apply_fn, get_loss_fn(loss_cfg), loss_cfg["weight_dict"], val_loader,
        batch_sharding=batch_sharding(mesh), top_k=(1, 5),
    )
    return evaluation(params, {})


def _assemble_schema_predictor(global_cfg, args, n_classes):
    from ..pipeline.bundle import load_bundle

    schema_cfg = global_cfg["schema_net"]
    bundle = load_bundle(schema_cfg["bundle"])
    uniform_range = tuple(
        (bundle.extra.get("discretization", {}).get("vocabulary", {}) or {}).get(
            "uniform_range", (-1.0, 1.0)
        )
    )
    predictor = build_predictor(
        model_cfg=bundle.model_cfg,
        schema_cfg=schema_cfg,
        num_classes=n_classes,
        num_codes=bundle.codebook.shape[0],
        code_dim=bundle.codebook.shape[1],
        encode_layer=bundle.encode_layer,
        uniform_range=uniform_range,
        dtype=resolve_dtype(
            (global_cfg.get("validation") or {}).get("dtype")
            or (global_cfg.get("training") or {}).get("dtype")
        ),
    )
    dummy = jnp.zeros((1, bundle.img_size, bundle.img_size, 3), jnp.float32)
    variables = predictor.init(jax.random.PRNGKey(0), dummy, method="init_full")
    params = dict(variables["params"])
    buffers = dict(variables["buffers"])
    params["backbone"] = bundle.backbone_params
    params["ingredient_backbone"] = {"vocabulary": bundle.codebook}
    if args.resume:
        from .common import merge_restored

        ckpt = CheckpointManager(os.path.dirname(os.path.abspath(args.resume)))
        restored = ckpt.restore(os.path.abspath(args.resume))
        params = merge_restored(params, restored["params"])
        buffers = merge_restored(buffers, restored["buffers"], name="ckpt buffers")
    return predictor, params, buffers
