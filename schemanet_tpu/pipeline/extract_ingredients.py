"""Stage 1: ingredient (codebook) extraction — mid-layer feature collection +
k-means (reference ``scripts/extract_ingredients.py``).

TPU-native design: the backbone forward (jitted, batched) streams mid-layer
patch tokens straight into on-device minibatch k-means — no sklearn, no
mandatory HDF5 materialisation (``--save-features`` optionally dumps
``saved_features.h5`` for reference-compatibility and resumable clustering).
"""

from __future__ import annotations

import logging
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmeans as kmeans_ops

logger = logging.getLogger(__name__)


def collect_mid_features(
    model,
    params,
    loader,
    encode_layer: int,
    max_features: int,
    as_iterator: bool = False,
    mesh=None,
    quant: bool = False,
):
    """Yield [n, d] batches of mid-layer patch tokens (CLS stripped, like the
    reference Adapter) until max_features is reached.

    With ``mesh`` the backbone forward runs data-parallel over the mesh's
    ``data`` axis (params replicated, batches sharded — the reference's stage 1
    is single-GPU by construction, ``scripts/extract_ingredients.py:59-114``;
    the 50M-feature ImageNet collection is embarrassingly data-parallel)."""

    from ..ops.pallas.attention import attention_backend

    fused = attention_backend() != "xla"

    def step_fn(p, image):
        # no capture needed here -> the whole forward can take the fused
        # Pallas attention on TPU backends
        seq, _ = model.apply(
            {"params": p}, image, encode_layer + 1, method="encode_until",
            fused_attention=fused, quant=quant,
        )
        return seq[:, model.num_prefix_tokens :, :]  # strip CLS/dist tokens

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, put_local_batch, replicated

        bsh = batch_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))
        step = jax.jit(step_fn, out_shardings=bsh)
        place = lambda img: put_local_batch(np.asarray(img), bsh)
    else:
        step = jax.jit(step_fn)
        place = jnp.asarray

    def gen() -> Iterator[np.ndarray]:
        seen = 0
        for batch in loader:
            feats = step(params, place(batch["image"]))
            flat = np.asarray(feats).reshape(-1, feats.shape[-1])
            if seen + len(flat) > max_features:
                flat = flat[: max_features - seen]
            seen += len(flat)
            yield flat
            if seen >= max_features:
                logger.info("collected %d features (cap reached)", seen)
                return
        logger.info("collected %d features (dataset exhausted)", seen)

    if as_iterator:
        return gen()
    chunks = list(gen())
    return np.concatenate(chunks) if chunks else np.zeros((0, 1), np.float32)


def extract_codebook(
    model,
    params,
    loader,
    encode_layer: int,
    num_clusters: int,
    max_features: int = 1_000_000,
    seed: int = 0,
    lloyd_iters: int = 10,
    lloyd_sample: int = 200_000,
    save_features_path: Optional[str] = None,
    mesh=None,
    quant: bool = False,
) -> np.ndarray:
    """Stream features -> minibatch k-means -> optional Lloyd refinement on a
    held sample. Returns [M, d] float32 centers.

    ``mesh`` data-parallelises the backbone forward (the stage's dominant
    cost); the k-means state is small and stays on the default device."""
    key = jax.random.PRNGKey(seed)
    held: list = []
    held_count = 0

    def stream():
        nonlocal held_count
        for chunk in collect_mid_features(
            model, params, loader, encode_layer, max_features, as_iterator=True,
            mesh=mesh, quant=quant,
        ):
            if held_count < lloyd_sample:
                take = min(len(chunk), lloyd_sample - held_count)
                held.append(chunk[:take])
                held_count += take
            if save_features_path is not None:
                _append_h5(save_features_path, chunk)
            # feed k-means in device-sized minibatches
            for i in range(0, len(chunk), 1024):
                yield chunk[i : i + 1024]

    init_sample_needed = max(num_clusters * 4, 4096)
    batches = stream()
    first: list = []
    first_count = 0
    for chunk in batches:
        first.append(chunk)
        first_count += len(chunk)
        if first_count >= init_sample_needed:
            break
    init_data = np.concatenate(first) if first else None
    if init_data is None or len(init_data) == 0:
        raise ValueError("no features collected")

    def full_stream():
        yield from first
        yield from batches

    centers = kmeans_ops.fit_kmeans(
        key,
        full_stream(),
        num_clusters,
        init_data=jnp.asarray(init_data),
        lloyd_iters=lloyd_iters,
        lloyd_data=jnp.asarray(np.concatenate(held)) if held else None,
    )
    return np.asarray(centers, np.float32)


def _append_h5(path: str, chunk: np.ndarray):
    import h5py

    with h5py.File(path, "a") as f:
        if "features" not in f:
            f.create_dataset(
                "features",
                data=chunk,
                maxshape=(None, chunk.shape[1]),
                chunks=(4096, chunk.shape[1]),
            )
        else:
            ds = f["features"]
            n = ds.shape[0]
            ds.resize(n + len(chunk), axis=0)
            ds[n:] = chunk


def cluster_saved_features(
    path: str, num_clusters: int, seed: int = 0, lloyd_iters: int = 10
) -> np.ndarray:
    """Resume-from-h5 path (reference --saved_features_fp)."""
    import h5py

    with h5py.File(path, "r") as f:
        key = "features" if "features" in f else "saved_features"
        feats = f[key][:]
    key_rng = jax.random.PRNGKey(seed)
    batches = [feats[i : i + 1024] for i in range(0, len(feats), 1024)]
    centers = kmeans_ops.fit_kmeans(
        key_rng, batches, num_clusters,
        init_data=jnp.asarray(feats[: max(4 * num_clusters, 4096)]),
        lloyd_iters=lloyd_iters,
        lloyd_data=jnp.asarray(feats[:200_000]),
    )
    return np.asarray(centers, np.float32)
