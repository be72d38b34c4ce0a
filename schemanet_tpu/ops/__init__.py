from .geometry import pairwise_point_dist, pairwise_point_sim
from .graph import (
    InstanceSlots,
    clamp_softmax,
    class_limited_edges,
    compact_instance_slots,
    feat_to_full_vertices,
    instance_edges,
    instance_vertices,
    vertex_attributes_full,
)
from .kmeans import KMeansState, fit_kmeans, kmeans_init, lloyd_step, minibatch_step
from .normalize import normalize_max, normalize_sum, normalize_sum_clamp, safe_softmax
from .vq import vq_assign, vq_encode

__all__ = [
    "InstanceSlots",
    "KMeansState",
    "clamp_softmax",
    "class_limited_edges",
    "compact_instance_slots",
    "feat_to_full_vertices",
    "fit_kmeans",
    "instance_edges",
    "instance_vertices",
    "kmeans_init",
    "lloyd_step",
    "minibatch_step",
    "normalize_max",
    "normalize_sum",
    "normalize_sum_clamp",
    "pairwise_point_dist",
    "pairwise_point_sim",
    "safe_softmax",
    "vertex_attributes_full",
    "vq_assign",
    "vq_encode",
]
