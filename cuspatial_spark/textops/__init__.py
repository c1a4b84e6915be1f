from .dedup import (  # noqa: F401
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .analysis import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from .urls import canonical_url, url_dedup  # noqa: F401
