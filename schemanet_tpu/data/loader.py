"""Host-side data loader: shuffle, shard per process, augment in a thread pool,
prefetch to device.

Replaces the reference's DataLoader + DistributedSampler + cal_split_args
stack (``schema_inference/data/__init__.py:79-147``): under single-controller
JAX each host takes a contiguous shard of the globally shuffled index stream
(per-epoch reshuffle via seed+epoch, the ``set_epoch`` equivalent), and
batches are ``jax.device_put`` with the data-parallel sharding so XLA sees the
global batch.
"""

from __future__ import annotations

import concurrent.futures as futures
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from . import native
from .augment import (
    DEFAULT_MEAN,
    DEFAULT_STD,
    compose,
    final_resize,
    get_augmentation,
    get_native_params_fn,
    normalize_batch,
)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        split: str = "train",
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        resize: Optional[int] = None,
        mean: Sequence[float] = DEFAULT_MEAN,
        std: Sequence[float] = DEFAULT_STD,
        num_workers: int = 8,
        transform: Optional[Callable] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        device_normalize: bool = False,
    ):
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.split = split
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.mean = tuple(mean)
        self.std = tuple(std)
        self.num_workers = max(1, num_workers)
        # when True, paths that can emit uint8 at the final size skip host-side
        # normalisation; the trainer normalises on device (4x less host->device
        # transfer — decisive when the host uplink is the bottleneck)
        self.device_normalize = device_normalize
        self.epoch = 0
        aug = transform
        if aug is None:
            aug = get_augmentation(getattr(dataset, "name", ""), split)
        self.transform = compose(aug, final_resize(resize))
        # fused native fast path (crop+flip+resize+normalize in C++): used when
        # the dataset's aug pipeline has a crop-param form and no custom
        # transform was supplied
        self._native_params = (
            get_native_params_fn(getattr(dataset, "name", ""), split)
            if transform is None and resize and native.available()
            else None
        )
        self._out_size = (resize, resize) if resize else None
        self._jpeg_fused = (
            self._native_params is not None
            and hasattr(dataset, "get_raw")
            and native.jpeg_available()
        )
        self._pcount = process_count if process_count is not None else jax.process_count()
        self._pindex = process_index if process_index is not None else jax.process_index()
        assert batch_size % self._pcount == 0, "global batch must divide process count"
        self.local_batch_size = batch_size // self._pcount
        self._pool = futures.ThreadPoolExecutor(max_workers=self.num_workers)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.global_batch_size
        if not self.drop_last and len(self.dataset) % self.global_batch_size:
            n += 1
        return n

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def _load_one(self, idx: int, rng_seed: int):
        rng = np.random.default_rng(rng_seed)
        if self._native_params is not None and self._jpeg_fused:
            # fused JPEG decode + aug: the decoded pixels never enter Python
            raw, label = self.dataset.get_raw(int(idx))
            if raw is not None:
                dims = native.jpeg_dims(raw)
                if dims is not None:
                    top, left, ch, cw, flip = self._native_params(dims, rng)
                    if self.device_normalize:
                        out = native.decode_process_u8(
                            raw, top, left, ch, cw, flip, self._out_size
                        )
                    else:
                        out = native.decode_process(
                            raw, top, left, ch, cw, flip, self._out_size,
                            self.mean, self.std,
                        )
                    if out is not None:
                        return out, label, True
        img, label = self.dataset[int(idx)]
        img = np.asarray(img)
        if self._native_params is not None:
            top, left, ch, cw, flip = self._native_params(img.shape, rng)
            if self.device_normalize:
                out = native.process_sample_u8(
                    img, top, left, ch, cw, flip, self._out_size
                )
            else:
                out = native.process_sample(
                    img, top, left, ch, cw, flip, self._out_size, self.mean, self.std
                )
            return out, label, True
        return self.transform(img, rng), label, False

    def _batch_fast_path(self, local_idx, n_valid: int, base_seed: int, start: int, lo: int):
        """One fused C++ call for in-memory fixed-size datasets: gather the raw
        uint8 batch, sample per-image crop params, process the whole batch in
        native code (saves the per-sample Python/thread round trips — the host
        here has one core, so crossings matter)."""
        images = self.dataset.images[local_idx]
        n, h, w, _ = images.shape
        if (
            getattr(self._native_params, "identity", False)
            and (h, w) == self._out_size
        ):
            # identity aug at target size: no filtering needed (the dominant
            # case for pre-sized val/synthetic data)
            labels = self.dataset.labels[local_idx].astype(np.int32)
            if self.device_normalize:
                return np.ascontiguousarray(images), labels  # uint8 passthrough
            return normalize_batch(images, self.mean, self.std), labels
        tops = np.empty(n, np.int32)
        lefts = np.empty(n, np.int32)
        flips = np.empty(n, np.int32)
        crop_h = crop_w = None
        for j in range(n):
            rng = np.random.default_rng(base_seed + start + lo + j)
            t, l, ch, cw, f = self._native_params((h, w), rng)
            tops[j], lefts[j], flips[j] = t, l, int(f)
            crop_h, crop_w = ch, cw
        if self.device_normalize:
            out = native.process_batch_u8(
                images, tops, lefts, crop_h, crop_w, flips, self._out_size
            )
        else:
            out = native.process_batch(
                images, tops, lefts, crop_h, crop_w, flips, self._out_size,
                self.mean, self.std,
            )
        labels = self.dataset.labels[local_idx].astype(np.int32)
        return out, labels

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._indices()
        n_batches = len(self)
        base_seed = (self.seed * 1_000_003 + self.epoch) & 0x7FFFFFFF
        # the batched native route applies when every image has the same shape
        # and the aug has a crop-param form (ArrayDataset-style datasets)
        batch_native = (
            self._native_params is not None
            and getattr(self._native_params, "fixed_crop", False)
            and hasattr(self.dataset, "images")
            and hasattr(self.dataset, "labels")
        )
        for b in range(n_batches):
            start = b * self.global_batch_size
            global_idx = order[start : start + self.global_batch_size]
            # per-process contiguous shard of the global batch
            lo = self._pindex * self.local_batch_size
            local_idx = global_idx[lo : lo + self.local_batch_size]
            if batch_native:
                n_valid = len(local_idx)
                if n_valid < self.local_batch_size:
                    pad = np.resize(
                        local_idx if n_valid else order[:1],
                        self.local_batch_size - n_valid,
                    )
                    local_idx = np.concatenate([local_idx, pad])
                images, labels = self._batch_fast_path(
                    local_idx, n_valid, base_seed, start, lo
                )
                valid = (np.arange(self.local_batch_size) < n_valid).astype(np.float32)
                yield {"image": images, "label": labels, "valid": valid}
                continue
            n_valid = len(local_idx)
            if n_valid < self.local_batch_size:
                # pad the final partial batch to a static shape; 'valid' masks
                # the padding out of the metrics (jit-friendly ragged tail)
                pad = np.resize(local_idx if n_valid else order[:1], self.local_batch_size - n_valid)
                local_idx = np.concatenate([local_idx, pad])
            jobs = [
                self._pool.submit(self._load_one, idx, base_seed + start + lo + j)
                for j, idx in enumerate(local_idx)
            ]
            out = [j.result() for j in jobs]
            images = np.stack([o[0] for o in out])
            labels = np.asarray([o[1] for o in out], np.int32)
            if not out[0][2]:  # PIL path returns uint8; normalize here
                images = normalize_batch(images, self.mean, self.std)
            valid = (np.arange(self.local_batch_size) < n_valid).astype(np.float32)
            yield {
                "image": images,
                "label": labels,
                "valid": valid,
            }


def device_prefetch(
    iterator: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    buffer_size: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Move batches to device (with the given sharding) ahead of compute."""
    import queue as queue_mod

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=buffer_size)
    sentinel = object()

    def put(batch):
        if sharding is not None:
            # multi-process safe: each host contributes its local loader shard
            # to the global batch (single-process this is plain device_put)
            from ..parallel.mesh import put_local_batch

            return {k: put_local_batch(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


def build_eval_loader(data_cfg: Dict[str, Any], val_cfg: Dict[str, Any], seed: int = 0):
    """(val_loader, num_classes) — reference build_eval_dataloader
    (data/__init__.py:16-76)."""
    from .datasets import get_dataset

    val_set = get_dataset(data_cfg, "val")
    loader = DataLoader(
        val_set,
        batch_size=val_cfg["batch_size"],
        split="val",
        shuffle=False,
        drop_last=False,
        seed=seed,
        resize=data_cfg.get("resize"),
        mean=data_cfg.get("mean", DEFAULT_MEAN),
        std=data_cfg.get("std", DEFAULT_STD),
        num_workers=val_cfg.get("num_workers", 8),
    )
    return loader, val_set.num_classes


def build_adv_loader(data_cfg: Dict[str, Any], val_cfg: Dict[str, Any], seed: int = 0):
    """Val-transform TRAIN-split dataset for adversarial/analysis use —
    reference build_adv_dataset (data/__init__.py:150-177, an exact duplicate
    of build_eval_dataset apart from the split)."""
    from .datasets import get_dataset

    train_set = get_dataset(data_cfg, "train")
    loader = DataLoader(
        train_set,
        batch_size=val_cfg["batch_size"],
        split="val",  # val transforms on the train split
        shuffle=False,
        drop_last=False,
        seed=seed,
        resize=data_cfg.get("resize"),
        mean=data_cfg.get("mean", DEFAULT_MEAN),
        std=data_cfg.get("std", DEFAULT_STD),
        num_workers=val_cfg.get("num_workers", 8),
    )
    return loader, train_set.num_classes


def build_loaders(
    data_cfg: Dict[str, Any],
    train_cfg: Dict[str, Any],
    val_cfg: Dict[str, Any],
    seed: int = 0,
):
    """(train_loader, val_loader, num_classes) from reference-style cfg blocks
    (data/__init__.py:79-147)."""
    from .datasets import get_dataset

    train_set = get_dataset(data_cfg, "train")
    val_set = get_dataset(data_cfg, "val")
    mean = data_cfg.get("mean", DEFAULT_MEAN)
    std = data_cfg.get("std", DEFAULT_STD)
    resize = data_cfg.get("resize")
    train_loader = DataLoader(
        train_set,
        batch_size=train_cfg["batch_size"],
        split="train",
        shuffle=True,
        drop_last=True,
        seed=seed,
        resize=resize,
        mean=mean,
        std=std,
        num_workers=train_cfg.get("num_workers", 8),
        device_normalize=True,
    )
    val_loader = DataLoader(
        val_set,
        batch_size=val_cfg["batch_size"],
        split="val",
        shuffle=False,
        drop_last=False,
        seed=seed,
        resize=resize,
        mean=mean,
        std=std,
        num_workers=val_cfg.get("num_workers", 8),
        device_normalize=True,
    )
    return train_loader, val_loader, train_set.num_classes
