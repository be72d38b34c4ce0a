"""Dataset registry (replaces the cv_lib classification dataset zoo used at
reference ``schema_inference/data/__init__.py:7-10``).

A dataset yields ``(uint8 HWC image, int label)`` pairs and exposes
``num_classes``/``classes``. Targets become ``{"label": ...}`` dicts at the
loader level, matching the reference's target contract (worker.py:123).

Registered names mirror the reference configs: cifar_10, cifar_100, imagenet
(+ ``imagenet=N`` subset variants), caltech_101, mini_imagenet, cub_200,
stanford_cars — plus ``synthetic`` for hardware-only benchmarking and tests
(no dataset downloads are possible in a zero-egress environment).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.registry import Registry

DATASET_REGISTRY: Registry = Registry("datasets")

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ArrayDataset:
    """In-memory uint8 dataset."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, classes: List[str], name: str):
        self.images = images
        self.labels = labels.astype(np.int64)
        self.classes = classes
        self.name = name

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        return self.images[idx], int(self.labels[idx])


class ImageFolderDataset:
    """ImageNet-style <root>/<class>/<image> tree, decoded lazily with PIL."""

    def __init__(
        self,
        root: str,
        classes: Optional[Sequence[str]] = None,
        name: str = "image_folder",
        class_offset: int = 0,
    ):
        self.root = os.path.expanduser(root)
        if classes is not None:
            self.classes = list(classes)  # no discovery listing needed
        else:
            self.classes = sorted(
                d for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            )
        self.name = name
        self.samples: List[Tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            cls_dir = os.path.join(self.root, cls)
            if not os.path.isdir(cls_dir):
                continue
            for fn in sorted(os.listdir(cls_dir)):
                if fn.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cls_dir, fn), label + class_offset))

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB")), label

    def get_raw(self, idx: int) -> Tuple[Optional[bytes], int]:
        """Raw JPEG bytes for the native fused decode path (None for non-JPEG
        files — the loader falls back to the PIL route)."""
        path, label = self.samples[idx]
        if path.lower().endswith((".jpg", ".jpeg")):
            with open(path, "rb") as f:
                return f.read(), label
        return None, label


class SubsetDataset:
    def __init__(self, base, indices: Sequence[int]):
        self.base = base
        self.indices = list(indices)
        self.classes = base.classes
        self.name = base.name

    @property
    def num_classes(self) -> int:
        return self.base.num_classes

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.base[self.indices[idx]]


def make_partial(dataset, fraction: Optional[float], seed: int = 0):
    """Random fraction subsample (init_schema_net.py --make_partial)."""
    if not fraction or fraction >= 1.0:
        return dataset
    rng = np.random.default_rng(seed)
    n = max(1, int(len(dataset) * fraction))
    idx = rng.permutation(len(dataset))[:n]
    return SubsetDataset(dataset, idx)


# ---------------------------------------------------------------------------
# CIFAR (python pickle batch format)
# ---------------------------------------------------------------------------


def _load_cifar_file(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = d.get(b"labels", d.get(b"fine_labels"))
    return np.ascontiguousarray(data), np.asarray(labels)


@DATASET_REGISTRY.register("cifar_10")
def build_cifar10(root: str, split: str = "train", **kwargs) -> ArrayDataset:
    base = os.path.join(os.path.expanduser(root), "cifar-10-batches-py")
    if split == "train":
        parts = [_load_cifar_file(os.path.join(base, f"data_batch_{i}")) for i in range(1, 6)]
        images = np.concatenate([p[0] for p in parts])
        labels = np.concatenate([p[1] for p in parts])
    else:
        images, labels = _load_cifar_file(os.path.join(base, "test_batch"))
    classes = [str(i) for i in range(10)]
    return ArrayDataset(images, labels, classes, "cifar_10")


@DATASET_REGISTRY.register("cifar_100")
def build_cifar100(root: str, split: str = "train", **kwargs) -> ArrayDataset:
    base = os.path.join(os.path.expanduser(root), "cifar-100-python")
    fn = "train" if split == "train" else "test"
    images, labels = _load_cifar_file(os.path.join(base, fn))
    classes = [str(i) for i in range(100)]
    return ArrayDataset(images, labels, classes, "cifar_100")


@DATASET_REGISTRY.register("mnist")
def build_mnist(root: str, split: str = "train", **kwargs) -> ArrayDataset:
    """MNIST from the standard IDX files (gz or raw); images replicated to 3
    channels to fit the RGB pipeline (the reference registers mnist augs at
    data/aug.py:33-34; its loader lives in cv_lib)."""
    import gzip

    base = os.path.expanduser(root)
    prefix = "train" if split == "train" else "t10k"

    def read(name):
        for candidate, opener in (
            (os.path.join(base, name), open),
            (os.path.join(base, name + ".gz"), gzip.open),
            (os.path.join(base, "MNIST", "raw", name), open),
            (os.path.join(base, "MNIST", "raw", name + ".gz"), gzip.open),
        ):
            if os.path.isfile(candidate):
                with opener(candidate, "rb") as f:
                    return f.read()
        raise FileNotFoundError(f"{name} under {base}")

    img_raw = read(f"{prefix}-images-idx3-ubyte")
    lab_raw = read(f"{prefix}-labels-idx1-ubyte")
    n = int.from_bytes(img_raw[4:8], "big")
    h = int.from_bytes(img_raw[8:12], "big")
    w = int.from_bytes(img_raw[12:16], "big")
    images = np.frombuffer(img_raw, np.uint8, offset=16).reshape(n, h, w, 1)
    images = np.repeat(images, 3, axis=-1)
    labels = np.frombuffer(lab_raw, np.uint8, offset=8).astype(np.int64)
    return ArrayDataset(images, labels, [str(i) for i in range(10)], "mnist")


# ---------------------------------------------------------------------------
# ImageNet-style folders
# ---------------------------------------------------------------------------


def load_class_list(path: str) -> List[str]:
    """Class names from a txt (one per line) or csv file.

    Two csv shapes are accepted (see configs/datasets/README.md):
    * plain one-column (class name per line);
    * the reference's pandas-style ``config/datasets/*_all_classes.csv``
      (header row ``,classes`` then ``<index>,<class name>`` rows) — the
      class name lives in the LAST column there, not the first.
    """
    classes: List[str] = []
    with open(os.path.expanduser(path)) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for i, line in enumerate(lines):
        cols = [c.strip() for c in line.split(",")]
        if len(cols) == 1:
            classes.append(cols[0])
            continue
        if i == 0 and cols[-1].lower() in ("classes", "class", "name"):
            continue  # pandas header row (",classes")
        # pandas-style "<row index>,<name>": take the name column
        classes.append(cols[-1] if (not cols[0] or cols[0].isdigit()) else cols[0])
    return classes


@DATASET_REGISTRY.register("imagenet")
def build_imagenet(
    root: str,
    split: str = "train",
    classes: Optional[Sequence[str]] = None,
    classes_file: Optional[str] = None,
    **kwargs,
) -> ImageFolderDataset:
    sub = "train" if split == "train" else "val"
    if classes is None and classes_file:
        classes = load_class_list(classes_file)
    return ImageFolderDataset(os.path.join(root, sub), classes=classes, name="imagenet")


def _imagenet_subset(n: int):
    def build(root: str, split: str = "train", classes=None, classes_file=None, **kwargs):
        # single directory listing for the class names, then one scan over the
        # kept class dirs only (the 1.28M-file train tree is walked once)
        sub = os.path.join(os.path.expanduser(root), "train" if split == "train" else "val")
        if classes is None and classes_file:
            classes = load_class_list(classes_file)
        if classes is None:
            classes = sorted(
                d for d in os.listdir(sub) if os.path.isdir(os.path.join(sub, d))
            )
        return ImageFolderDataset(sub, classes=list(classes)[:n], name=f"imagenet={n}")

    return build


@DATASET_REGISTRY.register("imagenet=10birds")
def build_imagenet_10birds(
    root: str, split: str = "train", classes=None, classes_file=None, **kwargs
):
    """The reference's named 10-bird-class ImageNet subset (aug.py:37-38; its
    wnid list lives in cv_lib). Provide the wnids via ``classes`` or
    ``classes_file`` in the dataset config."""
    if classes is None and classes_file:
        classes = load_class_list(classes_file)
    if classes is None:
        raise ValueError(
            "imagenet=10birds needs its wnid list: set dataset.classes or "
            "dataset.classes_file (10 wnids, one per line)"
        )
    sub = os.path.join(os.path.expanduser(root), "train" if split == "train" else "val")
    return ImageFolderDataset(sub, classes=classes, name="imagenet=10birds")


def _imagenet_robustness(name: str):
    """imagenet_a / imagenet_r (reference aug.py:57-58): val-only trees of 200
    wnid class folders. With ``imagenet_classes_file`` (the 1000 wnids in
    1000-class order) labels land in the full ImageNet label space so a
    1000-way classifier evaluates directly; otherwise labels are local 0..199.
    """

    def build(
        root: str,
        split: str = "val",
        imagenet_classes_file: Optional[str] = None,
        **kwargs,
    ):
        base = os.path.expanduser(root)
        # tolerate either <root>/ or <root>/val/ holding the wnid dirs
        sub = os.path.join(base, "val")
        if not os.path.isdir(sub):
            sub = base
        ds = ImageFolderDataset(sub, name=name)
        if imagenet_classes_file:
            full = load_class_list(imagenet_classes_file)
            index_of = {wnid: i for i, wnid in enumerate(full)}
            missing = [c for c in ds.classes if c not in index_of]
            if missing:
                raise ValueError(
                    f"{name}: wnids {missing[:3]}... absent from "
                    f"{imagenet_classes_file}"
                )
            remap = {local: index_of[c] for local, c in enumerate(ds.classes)}
            ds.samples = [(p, remap[l]) for p, l in ds.samples]
            ds.classes = full  # label space is now the full 1000 classes
        return ds

    return build


DATASET_REGISTRY.register("imagenet_a", _imagenet_robustness("imagenet_a"))
DATASET_REGISTRY.register("imagenet_r", _imagenet_robustness("imagenet_r"))


for _n in (10, 20, 50, 100):
    DATASET_REGISTRY.register(f"imagenet={_n}", _imagenet_subset(_n))


@DATASET_REGISTRY.register("caltech_101")
def build_caltech101(
    root: str,
    split: str = "train",
    train_per_class: int = 30,
    seed: int = 0,
    split_file: Optional[str] = None,
    **kwargs,
) -> SubsetDataset:
    """Caltech-101 with cv_lib-style *manual* split support: pass
    ``split_file`` (lines of ``<class_dir>/<filename>`` naming the TRAIN
    members; val = remainder) to reproduce the reference's exact membership
    and make accuracies comparable. Without it, a deterministic seeded
    ``train_per_class``-per-class split is used."""
    base = ImageFolderDataset(root, name="caltech_101")
    if split_file:
        with open(os.path.expanduser(split_file)) as f:
            train_set = {line.strip() for line in f if line.strip()}
        root_abs = os.path.expanduser(root)
        def rel(p):
            return os.path.relpath(p, root_abs)
        indices = [
            i for i, (p, _) in enumerate(base.samples)
            if (rel(p) in train_set) == (split == "train")
        ]
        return SubsetDataset(base, indices)
    rng = np.random.default_rng(seed)
    by_class: Dict[int, List[int]] = {}
    for i, (_, label) in enumerate(base.samples):
        by_class.setdefault(label, []).append(i)
    indices: List[int] = []
    for label, idxs in sorted(by_class.items()):
        idxs = list(rng.permutation(idxs))
        take = idxs[:train_per_class] if split == "train" else idxs[train_per_class:]
        indices.extend(take)
    return SubsetDataset(base, indices)


@DATASET_REGISTRY.register("mini_imagenet")
def build_mini_imagenet(
    root: str,
    split: str = "train",
    classes: Optional[Sequence[str]] = None,
    classes_file: Optional[str] = None,
    **kwargs,
):
    """mini-ImageNet as an ImageFolder tree restricted to a 100-wnid class
    list (``classes_file``: txt or reference-style csv — see
    configs/datasets/examples/)."""
    if classes is None and classes_file:
        classes = load_class_list(classes_file)
    sub = "train" if split == "train" else "val"
    path = os.path.join(root, sub)
    if not os.path.isdir(path):
        path = root  # single-folder layout with per-class split files
    return ImageFolderDataset(path, classes=classes, name="mini_imagenet")


class FileListDataset(ImageFolderDataset):
    """ImageFolderDataset API over an explicit (path, label) sample list."""

    def __init__(self, samples: List[Tuple[str, int]], classes: List[str], name: str):
        self.root = ""
        self.classes = list(classes)
        self.name = name
        self.samples = list(samples)


@DATASET_REGISTRY.register("cub_200")
def build_cub200(root: str, split: str = "train", **kwargs):
    """CUB-200-2011's real layout (the reference loads it via cv_lib; see
    aug.py:45-46): a flat ``images/`` tree driven by ``images.txt``
    (id rel_path), ``train_test_split.txt`` (id is_train) and
    ``image_class_labels.txt`` (id class_id, 1-based), with class names in
    ``classes.txt``. Falls back to a train/|val/ ImageFolder tree when the
    split files are absent."""
    base = os.path.expanduser(root)
    # the official tarball unpacks to CUB_200_2011/
    if not os.path.isfile(os.path.join(base, "images.txt")):
        nested = os.path.join(base, "CUB_200_2011")
        if os.path.isfile(os.path.join(nested, "images.txt")):
            base = nested
    images_txt = os.path.join(base, "images.txt")
    if not os.path.isfile(images_txt):
        return ImageFolderDataset(
            os.path.join(base, "train" if split == "train" else "val"), name="cub_200"
        )

    def read_pairs(fn):
        out = {}
        with open(os.path.join(base, fn)) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    out[parts[0]] = parts[1]
        return out

    paths = read_pairs("images.txt")
    is_train = read_pairs("train_test_split.txt")
    class_of = read_pairs("image_class_labels.txt")
    classes = [None] * 200
    with open(os.path.join(base, "classes.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                classes[int(parts[0]) - 1] = parts[1]
    classes = [c for c in classes if c is not None]

    want_train = split == "train"
    samples = [
        (os.path.join(base, "images", rel), int(class_of[img_id]) - 1)
        for img_id, rel in sorted(paths.items(), key=lambda kv: int(kv[0]))
        if (is_train.get(img_id) == "1") == want_train
    ]
    return FileListDataset(samples, classes, "cub_200")


@DATASET_REGISTRY.register("stanford_cars")
def build_stanford_cars(root: str, split: str = "train", **kwargs):
    """Stanford Cars' real layout (reference aug.py:47-48; loader in cv_lib):
    ``cars_train/``/``cars_test/`` flat image dirs with devkit .mat
    annotations (``cars_train_annos.mat`` / ``cars_test_annos_withlabels.mat``,
    class names in ``cars_meta.mat``; labels 1-based). Falls back to a
    train/|val/ ImageFolder tree when the devkit is absent."""
    base = os.path.expanduser(root)
    devkit = os.path.join(base, "devkit")
    want_train = split == "train"
    annos_fp = os.path.join(
        devkit, "cars_train_annos.mat" if want_train else "cars_test_annos_withlabels.mat"
    )
    if not os.path.isfile(annos_fp):
        return ImageFolderDataset(
            os.path.join(base, "train" if want_train else "val"), name="stanford_cars"
        )
    from scipy.io import loadmat

    meta = loadmat(os.path.join(devkit, "cars_meta.mat"), squeeze_me=True)
    classes = [str(c) for c in meta["class_names"]]
    # squeeze_me collapses 1-element struct arrays to 0-d; restore the axis
    annos = np.atleast_1d(loadmat(annos_fp, squeeze_me=True)["annotations"])
    img_dir = os.path.join(base, "cars_train" if want_train else "cars_test")
    samples = [
        (os.path.join(img_dir, str(a["fname"])), int(a["class"]) - 1) for a in annos
    ]
    return FileListDataset(samples, classes, "stanford_cars")


# ---------------------------------------------------------------------------
# Synthetic (tests + zero-egress benchmarking)
# ---------------------------------------------------------------------------


@DATASET_REGISTRY.register("synthetic")
def build_synthetic(
    root: str = "",
    split: str = "train",
    num_classes: int = 10,
    num_samples: int = 512,
    image_size: int = 32,
    seed: int = 0,
    **kwargs,
) -> ArrayDataset:
    """Deterministic class-separable images: class-seeded low-frequency pattern
    + noise. Good enough for the loss to move and for throughput benchmarks."""
    rng = np.random.default_rng(seed + (1 if split != "train" else 0))
    labels = rng.integers(0, num_classes, size=(num_samples,))
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    images = np.empty((num_samples, image_size, image_size, 3), np.uint8)
    for i, lab in enumerate(labels):
        phase = 2 * np.pi * (lab + 1) / num_classes
        base = 0.5 + 0.4 * np.sin(2 * np.pi * (lab + 2) * xx + phase) * np.cos(
            2 * np.pi * (lab + 1) * yy
        )
        noise = rng.normal(scale=0.1, size=(image_size, image_size, 3))
        img = np.clip(base[..., None] + noise, 0, 1)
        images[i] = (img * 255).astype(np.uint8)
    classes = [str(i) for i in range(num_classes)]
    return ArrayDataset(images, labels, classes, "synthetic")


def get_dataset(data_cfg: Dict[str, Any], split: str):
    """Build from a dataset yaml block (name/root/train/val/resize...)."""
    name = data_cfg["name"]
    split_cfg = data_cfg.get(split, {}) or {}
    kwargs = {
        k: v
        for k, v in data_cfg.items()
        if k not in ("name", "root", "train", "val", "resize", "make_partial", "mean", "std")
    }
    kwargs.update(split_cfg)
    kwargs.pop("split", None)
    ds = DATASET_REGISTRY.get(name)(root=data_cfg.get("root", ""), split=split, **kwargs)
    return make_partial(ds, data_cfg.get("make_partial"))
