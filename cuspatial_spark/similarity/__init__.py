from .ann import brute_force_topk, cosine_expr, ivf_topk, train_centroids  # noqa: F401
