from .atlas import AtlasConfig, SchemaAtlas, project_atlas_params
from .gnn import GNN, GNNLayer, GraphConv, Matcher, similarity_fn
from .loss import (
    LOSS_REGISTRY,
    cross_entropy,
    entropy,
    get_loss_fn,
    rectify_linear,
    weighted_total,
)
from .predictor import (
    IngredientBackbone,
    SchemaNetConfig,
    SchemaNetPredictor,
    build_predictor,
)

__all__ = [
    "GNN",
    "LOSS_REGISTRY",
    "AtlasConfig",
    "GNNLayer",
    "GraphConv",
    "IngredientBackbone",
    "Matcher",
    "SchemaAtlas",
    "SchemaNetConfig",
    "SchemaNetPredictor",
    "build_predictor",
    "cross_entropy",
    "entropy",
    "get_loss_fn",
    "project_atlas_params",
    "rectify_linear",
    "similarity_fn",
    "weighted_total",
]
