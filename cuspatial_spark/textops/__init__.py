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
from .bpe import DEFAULT_MERGES, bpe_tokenize, train_bpe  # noqa: F401
from .pipeline import corpus_signals, prepare_corpus  # noqa: F401
from .repetition import repetition_signals  # noqa: F401
from .urls import canonical_url, url_dedup  # noqa: F401
