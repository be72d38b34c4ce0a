"""Dataset parsing (CIFAR pickle format, image folders) and loader sharding."""

import os
import pickle

import numpy as np
import pytest

from schemanet_tpu.data.datasets import (
    build_cifar10,
    build_cifar100,
    build_synthetic,
    get_dataset,
    make_partial,
)
from schemanet_tpu.data.loader import DataLoader


@pytest.fixture
def fake_cifar_root(tmp_path, rng):
    """Write CIFAR-10/100 trees in the standard python-pickle batch format."""
    c10 = tmp_path / "cifar-10-batches-py"
    c10.mkdir()
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(20, 3072), dtype=np.uint8)
        with open(c10 / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, 20))}, f)
    test = rng.integers(0, 256, size=(30, 3072), dtype=np.uint8)
    with open(c10 / "test_batch", "wb") as f:
        pickle.dump({b"data": test, b"labels": list(rng.integers(0, 10, 30))}, f)

    c100 = tmp_path / "cifar-100-python"
    c100.mkdir()
    for split, n in (("train", 40), ("test", 25)):
        data = rng.integers(0, 256, size=(n, 3072), dtype=np.uint8)
        with open(c100 / split, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": list(rng.integers(0, 100, n))}, f)
    return str(tmp_path)


def test_cifar_pickle_parsing(fake_cifar_root):
    train = build_cifar10(fake_cifar_root, "train")
    assert len(train) == 100 and train.num_classes == 10
    img, label = train[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    val = build_cifar10(fake_cifar_root, "val")
    assert len(val) == 30
    c100 = build_cifar100(fake_cifar_root, "train")
    assert len(c100) == 40 and c100.num_classes == 100


def test_image_folder(tmp_path, rng):
    from PIL import Image

    from schemanet_tpu.data.datasets import ImageFolderDataset

    for cls in ("cat", "dog"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path / "train"))
    assert len(ds) == 6 and ds.classes == ["cat", "dog"]
    img, label = ds[0]
    assert img.shape == (20, 24, 3) and label == 0


def test_make_partial():
    ds = build_synthetic(num_classes=4, num_samples=100, image_size=8)
    part = make_partial(ds, 0.25, seed=1)
    assert len(part) == 25
    assert make_partial(ds, None) is ds


def test_loader_process_sharding():
    """Two simulated processes see disjoint halves of each global batch."""
    ds = build_synthetic(num_classes=4, num_samples=64, image_size=8)
    loaders = [
        DataLoader(ds, batch_size=16, split="val", shuffle=True, seed=7, resize=8,
                   num_workers=1, process_index=i, process_count=2)
        for i in range(2)
    ]
    b0 = next(iter(loaders[0]))
    b1 = next(iter(loaders[1]))
    assert b0["label"].shape == (8,) and b1["label"].shape == (8,)
    # shuffled identically across processes, split contiguously: first global
    # batch = concat of the two local shards and all distinct
    rng = np.random.default_rng((7, 0))
    order = rng.permutation(64)[:16]
    np.testing.assert_array_equal(
        np.concatenate([b0["label"], b1["label"]]), ds.labels[order].astype(np.int32)
    )


def test_loader_epoch_reshuffle():
    ds = build_synthetic(num_classes=4, num_samples=64, image_size=8)
    loader = DataLoader(ds, batch_size=16, split="train", shuffle=True, seed=0,
                        resize=8, num_workers=1)
    first = next(iter(loader))["label"]
    loader.set_epoch(1)
    second = next(iter(loader))["label"]
    assert not np.array_equal(first, second)  # set_epoch semantics
    loader.set_epoch(0)
    again = next(iter(loader))["label"]
    np.testing.assert_array_equal(first, again)  # deterministic per epoch


def test_get_dataset_passes_kwargs():
    cfg = {"name": "synthetic", "root": "", "train": {"split": "train"},
           "val": {"split": "val"}, "resize": 8, "num_classes": 5,
           "num_samples": 11, "image_size": 8, "make_partial": 0.5}
    ds = get_dataset(cfg, "train")
    assert ds.num_classes == 5 and len(ds) == 5  # partial applied


def test_class_list_file(tmp_path, rng):
    from PIL import Image

    from schemanet_tpu.data.datasets import build_imagenet, load_class_list

    for cls in ("n001", "n002", "n003"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)).save(d / "0.png")
    lst = tmp_path / "classes.csv"
    lst.write_text("n003, third bird\nn001, first bird\n")
    assert load_class_list(str(lst)) == ["n003", "n001"]
    ds = build_imagenet(str(tmp_path), "train", classes_file=str(lst))
    assert ds.classes == ["n003", "n001"]
    assert len(ds) == 2  # n002 excluded
    assert ds[0][1] == 0  # label order follows the list


def test_mnist_idx_parsing(tmp_path, rng):
    from schemanet_tpu.data.datasets import build_mnist

    def write_idx(prefix, n):
        images = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
        labels = rng.integers(0, 10, size=(n,)).astype(np.uint8)
        img = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") + (28).to_bytes(4, "big") \
            + (28).to_bytes(4, "big") + images.tobytes()
        lab = (2049).to_bytes(4, "big") + n.to_bytes(4, "big") + labels.tobytes()
        (tmp_path / f"{prefix}-images-idx3-ubyte").write_bytes(img)
        (tmp_path / f"{prefix}-labels-idx1-ubyte").write_bytes(lab)
        return labels

    train_labels = write_idx("train", 12)
    write_idx("t10k", 5)
    ds = build_mnist(str(tmp_path), "train")
    assert len(ds) == 12 and ds.num_classes == 10
    img, label = ds[0]
    assert img.shape == (28, 28, 3) and label == int(train_labels[0])
    assert len(build_mnist(str(tmp_path), "val")) == 5
