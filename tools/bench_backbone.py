"""Stage-0 backbone fine-tuning benchmark (single chip).

Measures the FULL train step — dropout forward + backward + grad clip +
AdamW — for the stage-0 recipe (reference 0.train_bakcbone.sh: DeiT-Tiny,
224px, dropout 0.1), the configuration PERFORMANCE.md 'Backbone fine-tuning'
reports. Round-2 baseline on the XLA path: 2,007 img/s/chip at bs=256 bf16.

Env knobs: BENCH_BATCH (256), BENCH_STEPS (30), BENCH_DTYPE (bf16),
BENCH_MODEL (tiny|small), SCHEMANET_{ATTN,LN,MLP}_BACKEND (auto) to A/B the
fused-kernel training path vs XLA.

Usage: python tools/bench_backbone.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    if os.environ.get("BENCH_FORCE_CPU") == "1":  # off-chip smoke runs
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    model_name = os.environ.get("BENCH_MODEL", "tiny")
    dims = {"tiny": (192, 3, 768), "small": (384, 6, 1536)}[model_name]
    embed, heads, ff = dims
    bs = int(os.environ.get("BENCH_BATCH", 256))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )

    from schemanet_tpu.models.vit import get_model

    cfg = {
        "name": "vit",
        "transformer": {
            "embed_dim": embed,
            "num_encoder_layers": 12,
            "num_heads": heads,
            "dim_feedforward": ff,
            "dropout": 0.1,
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
    y = jnp.asarray(rng.integers(0, 100, size=(bs,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]

    tx = optax.chain(
        optax.clip_by_global_norm(0.1),
        optax.adamw(1e-4, weight_decay=0.05),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key, x, y):
        key, sub = jax.random.split(key)

        def loss_fn(p):
            out = model.apply(
                {"params": p}, x, deterministic=False, rngs={"dropout": sub}
            )
            logits = out["pred"]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    from schemanet_tpu.train.common import make_train_prng

    key = make_train_prng(1)  # SCHEMANET_PRNG_IMPL=rbg to A/B the dropout PRNG
    # warmup (compile + axon one-time costs); host fetch to time truthfully
    for _ in range(5):
        params, opt_state, key, loss = train_step(params, opt_state, key, x, y)
    np.asarray(loss)

    trace_dir = os.environ.get("BENCH_PROFILE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, key, loss = train_step(params, opt_state, key, x, y)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / steps
    if trace_dir:
        jax.profiler.stop_trace()

    backends = {
        k: os.environ.get(f"SCHEMANET_{k}_BACKEND", "auto")
        for k in ("ATTN", "LN", "MLP")
    }
    print(
        f"deit-{model_name} bs={bs} {np.dtype(dtype).name} backends={backends}: "
        f"{dt * 1000:.1f} ms/step, {bs / dt:.0f} img/s/chip (loss {float(np.asarray(loss)):.3f})"
    )


if __name__ == "__main__":
    main()
