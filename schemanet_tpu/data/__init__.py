from .augment import AUG_REGISTRY, get_augmentation, normalize_batch
from .datasets import DATASET_REGISTRY, get_dataset, make_partial
from .loader import DataLoader, build_loaders, device_prefetch

__all__ = [
    "AUG_REGISTRY",
    "DATASET_REGISTRY",
    "DataLoader",
    "build_loaders",
    "device_prefetch",
    "get_augmentation",
    "get_dataset",
    "make_partial",
    "normalize_batch",
]
