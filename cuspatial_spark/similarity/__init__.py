from .ann import (  # noqa: F401
    brute_force_topk,
    cosine_expr,
    cosine_near_dup_pairs,
    ivf_topk,
    train_centroids,
)
from .semdedup import semantic_dedup  # noqa: F401
from .pq import (  # noqa: F401
    pq_encode,
    pq_reconstruct,
    pq_topk,
    train_pq,
)
