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
from .pipeline import (  # noqa: F401
    corpus_signals,
    prepare_corpus,
    prepare_training_data,
    write_training_shards,
)
from .decontam import decontaminate  # noqa: F401
from .mixture import mixture_rates, sample_mixture  # noqa: F401
from .packing import pack_sequences  # noqa: F401
from .repetition import repetition_signals  # noqa: F401
from .urls import canonical_url, url_dedup  # noqa: F401
