from .ann import (  # noqa: F401
    brute_force_topk,
    cosine_expr,
    cosine_near_dup_pairs,
    ivf_topk,
    train_centroids,
)
