"""Serving latency/throughput benchmark (single chip, chip-side compute).

Measures the jitted ServePredictor.predict microbatch at several sizes and
reports per-batch latency percentiles + throughput. Inputs are device-resident:
on this axon tunnel host->device uplink is ~26-46 MB/s (a relay artifact, see
PERFORMANCE.md), so including the transfer would benchmark the tunnel, not the
framework. On a production host add ~batch_bytes/PCIe-rate to the latencies.

CIFAR-100-scale flagship config (DeiT-Tiny, M=1024, K=100) with random params
— serving cost is shape-, not value-dependent.

Env knobs: BENCH_MICROBATCHES ("1,16,64,256"), BENCH_STEPS (50),
BENCH_DTYPE (bf16).

Usage: python tools/bench_serve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("BENCH_FORCE_CPU") == "1":  # off-chip smoke runs
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from schemanet_tpu.schema import build_predictor
    from schemanet_tpu.serve import ServePredictor

    dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )
    steps = int(os.environ.get("BENCH_STEPS", 50))
    sizes = [
        int(s) for s in os.environ.get("BENCH_MICROBATCHES", "1,16,64,256").split(",")
    ]

    embed_dim = 192
    model_cfg = {
        "name": "vit",
        "transformer": dict(
            embed_dim=embed_dim, num_encoder_layers=12, num_heads=3,
            dim_feedforward=768, dropout=None, activation="gelu",
            final_norm=True, norm_eps=1e-6,
        ),
        "patch_embed": dict(img_size=224, patch_size=16, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    schema_cfg = {
        "matcher": {"similarity": "inner_product"},
        "gnn": {"embed_dim": 256, "num_layers": 2, "activation": "relu"},
        "ir_atlas": dict(
            class_max_vertices=None, dist_pow=2, feat_h=14, feat_w=14,
            clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
            remove_self_loop=False, prune_node_threshold=0.001,
            graph_precision="default",
        ),
    }
    predictor = build_predictor(
        model_cfg, schema_cfg, num_classes=100, num_codes=1024,
        code_dim=embed_dim, encode_layer=9, dtype=dtype,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = predictor.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3), jnp.float32)
        )
    params = jax.device_put(variables["params"], jax.devices()[0])
    buffers = jax.device_put(variables["buffers"], jax.devices()[0])

    rng = np.random.default_rng(0)
    results = {}
    for mb in sizes:
        serve = ServePredictor(
            predictor, params, buffers, microbatch=mb,
            # BENCH_QUANT=1: W8A8 int8 frozen-backbone serving (ops/quant.py)
            quant_int8=os.environ.get("BENCH_QUANT") == "1",
        )
        x = jax.device_put(
            rng.normal(size=(mb, 224, 224, 3)).astype(np.float32), jax.devices()[0]
        )
        # warmup: compile + the backend's one-time lazy costs
        for _ in range(5):
            np.asarray(serve._predict(x))  # host fetch times truthfully on axon
        lat = []
        for _ in range(steps):
            t0 = time.perf_counter()
            np.asarray(serve._predict(x))
            lat.append(time.perf_counter() - t0)
        lat_ms = np.array(lat) * 1000
        results[mb] = {
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "img_per_sec": round(mb / (np.median(lat)), 1),
        }
        print(f"microbatch {mb}: {results[mb]}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "serve_latency", "dtype": np.dtype(dtype).name,
                      "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
