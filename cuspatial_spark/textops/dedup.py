"""Deduplication operators for large text corpora.

All hash primitives are md5-based so results are engine-portable
(byte-identical in Spark, DuckDB, Python) and deterministic across
cluster sizes.  Everything is pure Spark built-ins (whole-stage
codegen; shuffles only on groupBy/join keys).

Cost model (100 TB): md5 is the dominant per-byte cost, so each
shingle/token is hashed exactly ONCE; the k minhash values derive from
that single hash via affine permutations ``(a_i*h + b_i) mod p`` over
a Mersenne prime — integer arithmetic that whole-stage codegen chews
through.  Shingling stays map-side (per-row higher-order functions, no
explode); the only shuffles are the band-bucket self-join for LSH and
the md5 groupBy for exact dedup, whose keys are uniform by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime): with h, a, b < p the products stay
# < 2^62 (exact in int64 on every engine) AND a*h wraps the modulus
# ~2^31 times, so each (a_i*h + b_i) mod p is a genuinely independent
# universal-hash permutation — a larger p with int64-safe multipliers
# would be near-monotonic in h and make all k minhashes pick the same
# argmin shingle.
MINHASH_P = (1 << 31) - 1


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) affine-permutation parameters in
    [1, p) / [0, p), shared by the Spark operators and the SQL oracle
    builders (splitmix-style multiplicative scramble)."""
    a = [
        ((2654435761 * (i + 1) + 1013904223 * ((i + 7) ** 3)) % (MINHASH_P - 1)) + 1
        for i in range(num_hashes)
    ]
    b = [(40503 * (i + 1) ** 2 + 12345) % MINHASH_P for i in range(num_hashes)]
    return a, b


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, canonical_id): canonical_id = min doc id sharing the
    exact text.  One hash-shuffle on md5(text)."""
    return (
        docs.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("__h"))
        .withColumn("canonical_id", F.min(id_col).over(Window.partitionBy("__h")))
        .select(id_col, "canonical_id")
    )


def _shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct character-k-gram shingles per doc (built-ins only)."""
    n = F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(1))
    return (
        docs.select(id_col, text_col)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.col(text_col).substr(i, F.lit(k)),
                )
            ).alias("shingle"),
        )
        .dropDuplicates([id_col, "shingle"])
    )


def _shingle_hashes(text_col: str, shingle_k: int):
    """array<long> column: one md5-prefix hash (reduced mod MINHASH_P)
    per shingle position.  Exactly one md5 evaluation per shingle — the
    k minhash values derive from these by cheap affine permutations."""
    n = F.greatest(F.length(text_col) - F.lit(shingle_k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(
                F.md5(F.col(text_col).substr(i, F.lit(shingle_k)).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(MINHASH_P),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 8,
) -> DataFrame:
    """MinHash signature per doc: column ``mh{i}`` (bigint) = min over
    shingles of the i-th affine permutation of the shingle's 32-bit
    md5-prefix hash.

    ONE md5 per shingle regardless of ``num_hashes`` — min over
    duplicate shingles equals min over distinct ones, so no dedup pass
    is needed either.  One scan at any corpus size.

    r6 shape (guide §1.2/§4.1): shingle positions are EXPLODED and the
    md5 chain runs in whole-stage codegen feeding a partial-aggregated
    groupBy(id) of the k affine mins — measured ~2x over the previous
    per-row higher-order-function fold, whose per-element lambda
    evaluation is interpreted.  ASCII rows (checked per row:
    octet_length == length) take a byte-indexed substring — the
    character-indexed substring is an O(position) codepoint walk, i.e.
    O(len^2) per document — with byte-identical md5 inputs; non-ASCII
    rows keep the exact character-substring path.  The groupBy
    reuses the input's hash partitioning when it is already keyed on
    ``id_col`` (the entry fixtures are), making the whole signature
    computation shuffle-free; otherwise it exchanges one narrow
    (id, hash) row per shingle.
    """
    a, b = minhash_params(num_hashes)
    txt = F.col(text_col)
    n = F.greatest(F.length(txt) - F.lit(shingle_k - 1), F.lit(1))
    pos = docs.select(
        F.col(id_col),
        txt.cast("binary").alias("__tb"),
        txt.alias("__t"),
        (F.octet_length(txt) == F.length(txt)).alias("__ascii"),
        F.explode(F.sequence(F.lit(1), n)).alias("__i"),
    )
    sbytes = F.when(
        F.col("__ascii"), F.col("__tb").substr(F.col("__i"), F.lit(shingle_k))
    ).otherwise(
        F.col("__t").substr(F.col("__i"), F.lit(shingle_k)).cast("binary")
    )
    h = (
        F.conv(F.substring(F.md5(sbytes), 1, 8), 16, 10).cast("long")
        % F.lit(MINHASH_P)
    )
    hashed = pos.select(id_col, h.alias("__h"))
    return hashed.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(a[i]) * F.col("__h") + F.lit(b[i])) % F.lit(MINHASH_P)
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 8,
    mode: str = "allpairs",
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing at least
    one LSH band bucket (banding over the minhash signature).

    ``mode``:

    - ``"allpairs"`` — every co-bucketed pair.  Exact, but an m-doc
      bucket emits m² pairs: web corpora with boilerplate clusters of
      1e5+ near-identical docs would blow up.  Use for bounded corpora
      / oracle comparison.
    - ``"canonical"`` — each doc pairs only with the *minimum* doc id
      of its bucket: O(m) output per bucket, and the pairs form a star
      per bucket whose connected components equal the allpairs
      components — the 100-TB-safe shape for dedup clustering.
    """
    # spread the md5 work before computing signatures: small corpus
    # files often arrive as one partition, which would serialize the
    # whole signature computation onto one core.  Hash-partitioning on
    # the id also lets the signature groupBy run shuffle-free
    # (guide §2.4); defaultParallelism (not 2x) keeps every downstream
    # shuffle's M x R block count down (§2.2)
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism, id_col)
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    n_bands = num_hashes // band_size
    # bucket key = the band's signature values joined by ':' — no
    # second hashing pass; band id rides alongside as a join key
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"mh{b * band_size + j}").cast("string")
                                for j in range(band_size)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    # r6 (guide §2.3/§2.4): ONE groupBy per bucket with row-local pair
    # expansion, replacing the bands-with-bands self-join.  The
    # self-join planned the ENTIRE signature pipeline twice (one scan
    # + md5 pass per side) and shuffled both copies; collect_list
    # shuffles each (band, bucket, id) row once and expands pairs from
    # the sorted in-bucket id array with no further data movement.
    # Pair semantics are unchanged: sorted distinct ids make every
    # (ids[i], ids[j>i]) pair satisfy id_a < id_b, exactly the
    # self-join's a.id < b.id filter.
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"))
        .where(F.size("__ids") >= 2)
    )
    if mode == "canonical":
        pairs = buckets.select(
            F.element_at("__ids", 1).alias("id_a"),
            F.explode(F.slice("__ids", 2, F.size("__ids") - 1)).alias("id_b"),
        )
    else:
        # two chained Generate operators (codegen) instead of building
        # the m^2 struct array with interpreted nested transforms —
        # measured ~1.5x on the m^2 pair explosion
        pairs = buckets.select(
            "__ids", F.posexplode("__ids").alias("__i", "id_a")
        ).select(
            "id_a",
            F.explode(
                F.slice(
                    "__ids", F.col("__i") + F.lit(2),
                    F.size("__ids") - F.col("__i") - 1,
                )
            ).alias("id_b"),
        )
    return pairs.dropDuplicates(["id_a", "id_b"])


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given (id_a, id_b) pairs:
    |A ∩ B| / |A ∪ B| over distinct shingle sets."""
    sh = _shingles(docs, id_col, text_col, shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, on=["id_a", "id_b"], how="left")
        .na.fill({"n_inter": 0})
        .join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, pure built-ins (zero
    shuffles, no Python workers).

    Token hash = first 16 hex chars of md5(token) read as a big-endian
    uint64 (split into 32-bit ``hi``/``lo`` halves so every
    intermediate fits a signed int64 on any engine).  Each bit votes
    +1/-1 per token occurrence; bit = 1 iff votes >= 0.  Output
    columns: ``simhash`` (the packed int64, Java wraparound for bit
    63), plus ``simhash_hi``/``simhash_lo`` (the two uint32 halves —
    the engine-portable form used by the SQL oracle).
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    # one md5 + two hex->int conversions per token, materialized once
    hashed = docs.select(
        id_col,
        F.transform(
            toks,
            lambda t: F.struct(
                F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10)
                .cast("long")
                .alias("hi"),
                F.conv(F.substring(F.md5(t.cast("binary")), 9, 8), 16, 10)
                .cast("long")
                .alias("lo"),
            ),
        ).alias("__m"),
    )

    def pow2(j):
        # 2^j for a *column* j <= 31: binary-fp pow is exact for
        # powers of two (shiftleft/shiftright only take int literals)
        return F.pow(F.lit(2.0), j.cast("double")).cast("long")

    def half_votes(field: str):
        """array<long>[32] of per-bit votes over one 32-bit half."""
        return F.aggregate(
            "__m",
            F.array_repeat(F.lit(0).cast("long"), 32),
            lambda acc, h: F.zip_with(
                acc,
                F.sequence(F.lit(0), F.lit(31)),
                lambda a, j: a
                + F.floor(h[field] / pow2(j))
                .cast("long")
                .bitwiseAND(F.lit(1).cast("long"))
                * 2
                - 1,
            ),
        )

    def pack(votes_col):
        """Σ bit_j << j over the 32-entry votes array (fits int64)."""
        return F.aggregate(
            F.zip_with(
                votes_col,
                F.sequence(F.lit(0), F.lit(31)),
                lambda v, j: F.when(v >= 0, pow2(j)).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    out = hashed.select(
        id_col,
        F.when(F.size("__m") == 0, F.lit(0).cast("long"))
        .otherwise(pack(half_votes("lo")))
        .alias("simhash_lo"),
        F.when(F.size("__m") == 0, F.lit(0).cast("long"))
        .otherwise(pack(half_votes("hi")))
        .alias("simhash_hi"),
    )
    return out.select(
        id_col,
        F.shiftleft("simhash_hi", 32).bitwiseOR(F.col("simhash_lo")).alias("simhash"),
        "simhash_hi",
        "simhash_lo",
    )
