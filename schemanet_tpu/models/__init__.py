from .attention import MultiHeadSelfAttention, dot_product_attention
from .layers import MLP, LearnablePosEncoding, PatchEmbed, get_activation
from .capture import MidExtractor, translate_probe_name
from .port import load_pretrain_into, merge_pretrained, torch_vit_to_flax
from .transformer import EncoderLayer, Transformer
from .vit import MODEL_REGISTRY, DeiT, ViT, build_deit, build_vit, get_model

__all__ = [
    "MODEL_REGISTRY",
    "MLP",
    "DeiT",
    "EncoderLayer",
    "LearnablePosEncoding",
    "MultiHeadSelfAttention",
    "PatchEmbed",
    "Transformer",
    "ViT",
    "build_deit",
    "build_vit",
    "dot_product_attention",
    "get_activation",
    "get_model",
    "load_pretrain_into",
    "merge_pretrained",
    "torch_vit_to_flax",
]
