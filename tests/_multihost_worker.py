"""Subprocess entry for the multi-host integration test (test_multihost.py).

Each process initialises ``jax.distributed`` over a localhost coordinator with
``8 // nproc`` virtual CPU devices, so the GLOBAL device count (8) — and hence
the global mesh, batch math and SPMD program — is identical for 1-process and
2-process launches. It then trains the tiny SchemaNet predictor through the
real ``Trainer`` (per-process loader shards, global-array assembly, projection,
optimizer, validate, collective checkpoint save) and dumps metrics to JSON.

This is the executable analogue of the reference's actually-multi-process
launcher (``dist_engine.py:106-146`` — TCP rendezvous + mp.spawn): the parity
assertion "multi-process == single-process" lives in test_multihost.py.

Run as: python -m tests._multihost_worker <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np

    from schemanet_tpu.data.datasets import get_dataset
    from schemanet_tpu.data.loader import DataLoader
    from schemanet_tpu.schema import build_predictor, get_loss_fn
    from schemanet_tpu.schema.atlas import project_atlas_params
    from schemanet_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_predictor import K, M, D, make_predictor

    data_cfg = {
        "name": "synthetic",
        "root": "",
        "num_classes": K,
        "num_samples": 64,
        "image_size": 32,
    }
    train_set = get_dataset(data_cfg, "train")
    val_set = get_dataset(data_cfg, "val")
    kw = dict(seed=0, resize=32, num_workers=2, device_normalize=True)
    train_loader = DataLoader(train_set, batch_size=16, split="train",
                              shuffle=True, drop_last=True, **kw)
    val_loader = DataLoader(val_set, batch_size=16, split="val",
                            shuffle=False, drop_last=False, **kw)

    predictor = make_predictor()
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = predictor.init(jax.random.PRNGKey(0), dummy, method="init_full")
    params, buffers = dict(variables["params"]), dict(variables["buffers"])
    atlas_cfg = predictor.cfg.atlas

    def project(p):
        return dict(p, schema_net=project_atlas_params(p["schema_net"], atlas_cfg))

    def apply_fn(p, b, image, rng, train):
        return predictor.apply({"params": p, "buffers": b}, image)

    loss_fn = get_loss_fn({"name": "schema_inference_loss"})
    weights = {"cls": 1.0, "re_entropy_vertex": 0.1, "re_entropy_edge": 0.1}

    trainer = Trainer(
        cfg=TrainerConfig(
            train_epochs=2,
            print_interval=1000,
            val_interval=10_000,
            batch_size=16,
            clip_max_norm=0.1,
            optimizer={"name": "AdamW", "lr": 1e-3, "weight_decay": 0.01},
            lr_schedule={"name": "cosine_annealing", "T_max": 2},
            frozen_patterns=(r"backbone\.", r"ingredient_backbone\."),
        ),
        apply_fn=apply_fn,
        loss_fn=loss_fn,
        loss_weights=weights,
        params=params,
        buffers=buffers,
        train_loader=train_loader,
        val_loader=val_loader,
        project_params=project,
        log_dir=None,
        ckpt_dir=os.path.join(outdir, "ckpt"),
        seed=0,
        name=f"mh{nproc}p{pid}",
    )
    final = trainer(initial_validation=False)

    digest = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(trainer.full_params):
        digest += float(np.abs(np.asarray(leaf, np.float64)).sum())

    result = {
        "process": pid,
        "nproc": nproc,
        "steps": trainer.iter_count,
        "val_loss": float(final["loss"]),
        "val_acc1": float(final["acc"][1]),
        "val_loss_dict": {k: float(v) for k, v in final["loss_dict"].items()},
        "param_digest": digest,
    }
    with open(os.path.join(outdir, f"result_{nproc}p_{pid}.json"), "w") as f:
        json.dump(result, f)
    print("OK", json.dumps(result))


if __name__ == "__main__":
    main()
