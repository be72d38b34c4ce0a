"""Stage-1 extraction-forward benchmark: frozen backbone encode_until
throughput, fp32 vs bf16 vs W8A8 int8 (single chip).

This is the dominant cost of the 50M-feature ImageNet codebook extraction
(PERFORMANCE.md measured ~2.2 h single-chip at bf16 in round 2); v5e's MXU
int8 peak is 2x bf16, so the quantized path (ops/quant.py, --quant-int8)
targets roughly halving it. The loop matches collect_mid_features' jitted
step (encode_until(encode_layer+1) + prefix-token strip), minus the host
k-means hand-off.

Env knobs: BENCH_BATCH (1024), BENCH_STEPS (20), BENCH_MODEL (tiny|small),
BENCH_ENCODE_LAYER (9), BENCH_QUANT (0|1), BENCH_DTYPE (bf16|fp32),
BENCH_FORCE_CPU=1 for off-chip smoke runs.

Usage: python tools/bench_extract.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    model_name = os.environ.get("BENCH_MODEL", "tiny")
    embed, heads, ff = {"tiny": (192, 3, 768), "small": (384, 6, 1536)}[model_name]
    bs = int(os.environ.get("BENCH_BATCH", 1024))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    encode_layer = int(os.environ.get("BENCH_ENCODE_LAYER", 9))
    quant = os.environ.get("BENCH_QUANT") == "1"
    dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )

    from schemanet_tpu.models.vit import get_model
    from schemanet_tpu.ops.pallas.attention import attention_backend

    cfg = {
        "name": "vit",
        "transformer": {
            "embed_dim": embed,
            "num_encoder_layers": 12,
            "num_heads": heads,
            "dim_feedforward": ff,
            "activation": "gelu",
            "final_norm": True,
            "norm_eps": 1e-6,
        },
        "patch_embed": {"img_size": 224, "patch_size": 16, "image_channels": 3},
        "pos_encoding": {"name": "learnable"},
    }
    model = get_model(cfg, 100, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    fused = attention_backend() != "xla"

    @jax.jit
    def step(p, image):
        seq, _ = model.apply(
            {"params": p}, image, encode_layer + 1, method="encode_until",
            fused_attention=fused, quant=quant,
        )
        return seq[:, model.num_prefix_tokens :, :]

    for _ in range(3):
        feats = step(params, x)
    np.asarray(feats[:1, :1])  # host fetch (axon's block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(steps):
        feats = step(params, x)
    np.asarray(feats[:1, :1])
    dt = (time.perf_counter() - t0) / steps

    mode = "int8" if quant else np.dtype(dtype).name
    print(
        f"extract deit-{model_name} layer<{encode_layer + 1} bs={bs} {mode} "
        f"fused={fused}: {dt * 1000:.1f} ms/step, {bs / dt:.0f} img/s/chip"
    )


if __name__ == "__main__":
    main()
