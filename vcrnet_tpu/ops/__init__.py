from vcrnet_tpu.ops.graph import (
    pairwise_sqdist,
    neg_pairwise_sqdist,
    knn,
    kfn,
    gather_neighbors,
    gather_max_neighbors,
    graph_feature,
)
from vcrnet_tpu.ops.fps import farthest_point_sample

__all__ = [
    "pairwise_sqdist",
    "neg_pairwise_sqdist",
    "knn",
    "kfn",
    "gather_neighbors",
    "gather_max_neighbors",
    "graph_feature",
    "farthest_point_sample",
]
