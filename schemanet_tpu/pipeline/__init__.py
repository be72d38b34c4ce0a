from .bundle import Bundle, load_atlas_init, load_bundle, save_atlas_init, save_bundle
from .extract_ingredients import cluster_saved_features, extract_codebook
from .init_schema_net import init_atlas

__all__ = [
    "Bundle",
    "cluster_saved_features",
    "extract_codebook",
    "init_atlas",
    "load_atlas_init",
    "load_bundle",
    "save_atlas_init",
    "save_bundle",
]
