"""Image augmentations matching the reference's per-dataset registry
(``schema_inference/data/aug.py:7-59``):

* CIFAR train: RandomCrop(32, padding=4) + RandomHorizontalFlip
* ImageNet-style train: RandomResizedCrop(224, scale=(0.6, 1.0)) + flip
* ImageNet-style val: Resize(256, bicubic) + CenterCrop(224)
* everything is finally resized to the dataset's ``resize`` (224) like
  cv_lib's ClassificationDataset.

Host-side numpy/PIL ops over uint8 HWC images, composed per-sample; the
normalisation to float happens in the loader collate.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

Transform = Callable[[np.ndarray, np.random.Generator], np.ndarray]


def compose(*transforms: Optional[Transform]) -> Transform:
    ts = [t for t in transforms if t is not None]

    def run(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        for t in ts:
            img = t(img, rng)
        return img

    return run


def random_crop(size: Tuple[int, int], padding: int = 0) -> Transform:
    def run(img, rng):
        if padding:
            img = np.pad(
                img, ((padding, padding), (padding, padding), (0, 0)), mode="constant"
            )
        h, w = img.shape[:2]
        th, tw = size
        top = int(rng.integers(0, h - th + 1))
        left = int(rng.integers(0, w - tw + 1))
        return img[top : top + th, left : left + tw]

    return run


def random_horizontal_flip(p: float = 0.5) -> Transform:
    def run(img, rng):
        return img[:, ::-1] if rng.random() < p else img

    return run


def _pil_resize(img: np.ndarray, size: Tuple[int, int], mode=Image.BILINEAR) -> np.ndarray:
    return np.asarray(Image.fromarray(img).resize((size[1], size[0]), mode))


def resize(size, mode=Image.BILINEAR, keep_aspect: bool = True) -> Transform:
    """int size: resize the short edge keeping aspect (torchvision semantics)."""

    def run(img, rng):
        if isinstance(size, int) and keep_aspect:
            h, w = img.shape[:2]
            if h < w:
                out = (size, max(1, round(w * size / h)))
            else:
                out = (max(1, round(h * size / w)), size)
        else:
            out = (size, size) if isinstance(size, int) else tuple(size)
        return _pil_resize(img, out, mode)

    return run


def center_crop(size: Tuple[int, int]) -> Transform:
    def run(img, rng):
        h, w = img.shape[:2]
        th, tw = size
        if h < th or w < tw:
            img = _pil_resize(img, (max(h, th), max(w, tw)))
            h, w = img.shape[:2]
        top = (h - th) // 2
        left = (w - tw) // 2
        return img[top : top + th, left : left + tw]

    return run


def random_resized_crop(
    size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Transform:
    """torchvision RandomResizedCrop sampling (10 tries then center fallback)."""

    def run(img, rng):
        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * rng.uniform(*scale)
            log_ratio = np.log(ratio)
            aspect = np.exp(rng.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                top = int(rng.integers(0, h - ch + 1))
                left = int(rng.integers(0, w - cw + 1))
                crop = img[top : top + ch, left : left + cw]
                return _pil_resize(crop, tuple(size))
        return center_crop(tuple(size))(_pil_resize(img, (max(h, size[0]), max(w, size[1]))), rng)

    return run


def random_rotation(degrees: Tuple[float, float]) -> Transform:
    def run(img, rng):
        angle = rng.uniform(*degrees)
        return np.asarray(Image.fromarray(img).rotate(angle, resample=Image.BILINEAR))

    return run


# ---------------------------------------------------------------------------
# Per-dataset registry (data/aug.py:26-59)
# ---------------------------------------------------------------------------

_CIFAR_TRAIN = compose(random_crop((32, 32), padding=4), random_horizontal_flip())
_IMAGENET_TRAIN = compose(
    random_resized_crop((224, 224), scale=(0.6, 1.0)), random_horizontal_flip()
)
_IMAGENET_VAL = compose(resize(256, Image.BICUBIC), center_crop((224, 224)))
_MNIST_TRAIN = compose(random_rotation((-30, 30)))

_IMAGENET_LIKE = (
    ["imagenet", "caltech_101", "mini_imagenet", "cub_200", "stanford_cars",
     "imagenet_a", "imagenet_r"]
    + [f"imagenet={n}" for n in (10, 20, 50, 100)]
    + ["imagenet=10birds"]
)

AUG_REGISTRY: Dict[str, Optional[Transform]] = {
    "mnist_train": _MNIST_TRAIN,
    "mnist_val": None,
    "cifar_10_train": _CIFAR_TRAIN,
    "cifar_10_val": None,
    "cifar_100_train": _CIFAR_TRAIN,
    "cifar_100_val": None,
    "synthetic_train": None,
    "synthetic_val": None,
}
for _name in _IMAGENET_LIKE:
    AUG_REGISTRY[f"{_name}_train"] = _IMAGENET_TRAIN
    AUG_REGISTRY[f"{_name}_val"] = _IMAGENET_VAL


def get_augmentation(dataset_name: str, split: str) -> Optional[Transform]:
    key = f"{dataset_name}_{'train' if split == 'train' else 'val'}"
    return AUG_REGISTRY.get(key)


def final_resize(size: Optional[int]) -> Optional[Transform]:
    """The dataset-level ``resize: 224`` applied after augs (cv_lib dataset)."""
    if not size:
        return None

    def run(img, rng):
        if img.shape[0] == size and img.shape[1] == size:
            return img
        return _pil_resize(img, (size, size))

    return run


# ---------------------------------------------------------------------------
# Native fast path: express each aug pipeline as ONE (crop, flip) parameter
# sample; the fused C++ kernel (native/imagepipe) then does
# crop+flip+resize+normalize in a single pass. Semantically:
#   cifar train:    RandomCrop(32, pad=4)+flip, then resize -> crop window may
#                   extend outside the image (zero padding), like torch's pad.
#   imagenet train: RandomResizedCrop(scale .6-1)+flip == sample a crop box,
#                   resize it to the output size.
#   imagenet val:   Resize(256 short edge)+CenterCrop(224) == center crop of
#                   size short*224/256, resized to 224 (same box, one filter
#                   pass instead of two).
#   no aug:         full-image crop + resize.
# ---------------------------------------------------------------------------


def _params_cifar_train(shape, rng):
    h, w = shape[:2]
    pad = 4
    top = int(rng.integers(0, 2 * pad + 1)) - pad
    left = int(rng.integers(0, 2 * pad + 1)) - pad
    return top, left, h, w, rng.random() < 0.5


def _params_rrc_train(shape, rng, scale=(0.6, 1.0), ratio=(3 / 4, 4 / 3)):
    h, w = shape[:2]
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = np.exp(rng.uniform(*np.log(ratio)))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw, rng.random() < 0.5
    side = min(h, w)
    return (h - side) // 2, (w - side) // 2, side, side, rng.random() < 0.5


def _params_imagenet_val(shape, rng):
    h, w = shape[:2]
    short = min(h, w)
    crop = max(1, int(round(short * 224.0 / 256.0)))
    return (h - crop) // 2, (w - crop) // 2, crop, crop, False


def _params_identity(shape, rng):
    h, w = shape[:2]
    return 0, 0, h, w, False


# crop size is a pure function of the source shape for these (batchable with
# one C++ call); RandomResizedCrop samples a different crop box per image
_params_cifar_train.fixed_crop = True
_params_imagenet_val.fixed_crop = True
_params_identity.fixed_crop = True
_params_identity.identity = True  # no crop/flip: whole-batch normalize suffices
_params_rrc_train.fixed_crop = False

NATIVE_AUG_REGISTRY: Dict[str, Callable] = {
    "cifar_10_train": _params_cifar_train,
    "cifar_100_train": _params_cifar_train,
    "cifar_10_val": _params_identity,
    "cifar_100_val": _params_identity,
    "synthetic_train": _params_identity,
    "synthetic_val": _params_identity,
}
for _name in _IMAGENET_LIKE:
    NATIVE_AUG_REGISTRY[f"{_name}_train"] = _params_rrc_train
    NATIVE_AUG_REGISTRY[f"{_name}_val"] = _params_imagenet_val


def get_native_params_fn(dataset_name: str, split: str) -> Optional[Callable]:
    key = f"{dataset_name}_{'train' if split == 'train' else 'val'}"
    return NATIVE_AUG_REGISTRY.get(key)


# standard ImageNet statistics; overridable per dataset yaml (mean/std keys)
DEFAULT_MEAN = (0.485, 0.456, 0.406)
DEFAULT_STD = (0.229, 0.224, 0.225)


def normalize_batch(
    images: np.ndarray,
    mean: Sequence[float] = DEFAULT_MEAN,
    std: Sequence[float] = DEFAULT_STD,
) -> np.ndarray:
    x = images.astype(np.float32) / 255.0
    x -= np.asarray(mean, np.float32)
    x /= np.asarray(std, np.float32)
    return x
