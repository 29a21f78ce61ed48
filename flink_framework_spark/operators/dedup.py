"""Deduplication operators for large-scale text corpora (SURVEY.md §2
K1/K2): exact, MinHash+LSH near-dup, SimHash, and n-gram Jaccard.

Scale design: every path avoids the all-pairs cross join. Exact dedup
is a hash groupBy; MinHash/LSH and SimHash generate *candidate pairs*
via equi-joins on banded signatures / hash prefixes (shuffle on the
band key, linear in corpus size + output pairs); n-gram Jaccard is the
verification kernel applied only to candidates (or to an explicit
blocking key at small scale).

MinHash here is expressed with JVM-side expressions only: shingles via
``transform`` over a token array, per-shingle hashes via ``xxhash64``
with per-permutation seeds, signature minima via ``array_min`` — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before CPU-heavy
    expression stages. Small-file inputs (a single parquet file = a
    single task) would otherwise serialize shingling/hashing on one
    core; at warehouse scale the input already has enough splits and
    this is a cheap round-robin of compact rows."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def normalize_text(col: Column) -> Column:
    """The canonical form exact dedup hashes: trimmed, lower-cased."""
    return F.lower(F.trim(col))


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level exact-dup stats: total docs vs distinct normalized
    md5 fingerprints (K1)."""
    fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (token sets
    saturate on small vocabularies — SURVEY.md §5.3 — so shingle)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    gram = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return F.array_distinct(
        F.when(count > 0, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )
    )


# 2-universal permutation family over a Mersenne prime: h_i(x) =
# (a_i * x + b_i) mod P applied to ONE base xxhash64 per shingle.
# Deterministic parameters (seeded), small enough that a_i * x never
# overflows a 64-bit long under ANSI arithmetic.
_MINHASH_P = 2147483647  # 2^31 - 1

def _perm_params(num_hashes: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(42)
    return [
        (rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P))
        for _ in range(num_hashes)
    ]


def minhash_signature(hash_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from a column of base shingle hashes.

    ``hash_col`` MUST be a materialized column reference (not an
    inline expression): each of the ``num_hashes`` permutations
    references it, and an inline expression would be duplicated
    per-permutation by projection collapse — a 64x blowup measured at
    ~400s for 5000 docs before this restructuring.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hash_col,
                    lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MINHASH_P)),
                )
            )
            for a, b in _perm_params(num_hashes)
        ]
    )


def shingle_hashes(shingle_col: Column) -> Column:
    """One 2^31-bounded base hash per shingle (computed exactly once;
    permutations derive from it arithmetically)."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P)))


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature
    become a candidate pair (doc_a < doc_b).

    Plan shape: explode to ``bands`` rows per doc, equi-join on
    (band_id, band_hash) — linear work + one shuffle; no cross join.
    """
    rows_per_band = num_hashes // bands
    # staged projections: shingles -> base hashes -> signature, each a
    # materialized column so no stage's expression is duplicated
    sh = _spread(df).select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), shingle_n).alias("__sh"),
    )
    hs = sh.select("__id", shingle_hashes(F.col("__sh")).alias("__hs"))
    sig = hs.select(
        "__id", minhash_signature(F.col("__hs"), num_hashes).alias("__sig")
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    left = banded.select(
        F.col("__id").alias("doc_a"), "band", "bucket"
    )
    right = banded.select(F.col("__id").alias("doc_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard."""
    sh = _spread(df).select(
        F.col(id_col).alias("__jid"),
        shingles(F.col(text_col), shingle_n).alias("__sh"),
    )
    a = sh.select(F.col("__jid").alias("doc_a"), F.col("__sh").alias("__sa"))
    b = sh.select(F.col("__jid").alias("doc_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (F.size("__sa") + F.size("__sb")).cast("double") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full MinHash near-dedup: LSH candidates -> exact Jaccard filter."""
    cands = minhash_candidates(df, id_col, text_col, shingle_n, num_hashes, bands)
    return jaccard_pairs(df, cands, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash64(hash_col: Column) -> Column:
    """64-bit SimHash from a column of 64-bit shingle hashes (must be
    a materialized column reference — see minhash_signature — or the
    hash expression is duplicated 64x), built from per-bit majority
    votes (JVM expressions only).

    For each bit b: sum over shingles of (+1 if bit set else -1); the
    fingerprint sets bit b when the sum is positive. Near-dups then
    differ in few bits; candidate generation joins on rotated prefix
    blocks (pigeonhole over Hamming distance).
    """
    mask = lambda b: F.shiftleft(F.lit(1).cast("long"), b)  # noqa: E731
    bit = lambda b: F.aggregate(  # noqa: E731
        hash_col,
        F.lit(0),
        lambda acc, x: acc + F.when(x.bitwiseAND(mask(b)) != 0, 1).otherwise(-1),
    )
    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + F.when(bit(b) > 0, mask(b)).otherwise(F.lit(0).cast("long"))
    return out


def ngram_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs with *min-shingle blocking*.

    Blocking key = lexicographic minimum shingle — exactly a
    1-permutation MinHash band, so two docs collide with probability
    equal to their Jaccard similarity. On the fixtures this recovers
    every planted pair (J>=0.5) while generating ~0.1% of the all-pairs
    candidate set; it is fully SQL-expressible, which is why this
    variant (unlike the 64-permutation ``near_dup_pairs_minhash``) can
    be DuckDB-oracle-checked. Plan: shingle map -> equi-join on the
    blocking key -> exact Jaccard verify. No cross join anywhere.
    """
    toks_ok = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) >= shingle_n
    sh = (
        _spread(df).filter(toks_ok)
        .select(
            F.col(id_col).alias("__id"),
            shingles(F.col(text_col), shingle_n).alias("__sh"),
        )
        .withColumn("__mink", F.array_min("__sh"))
    )
    a = sh.select(
        F.col("__id").alias("doc_a"), F.col("__sh").alias("__sa"), "__mink"
    )
    b = sh.select(
        F.col("__id").alias("doc_b"), F.col("__sh").alias("__sb"), "__mink"
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (F.size("__sa") + F.size("__sb")).cast("double") - inter
    jac = inter / union
    return (
        a.join(b, ["__mink"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("__jac", jac)
        .filter(F.col("__jac") >= threshold)
        .select("doc_a", "doc_b", round_duck("__jac", 4).alias("jac"))
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 16,
    n_blocks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """SimHash near-dup candidates: 64-bit fingerprints, pigeonhole
    blocking on ``n_blocks`` equal bit-blocks (any pair with Hamming
    distance < n_blocks is GUARANTEED to share a block; pairs up to
    ~2x that are found with high probability), then exact bit_count
    verification. Linear work + equi-join — the same no-cross-join
    discipline as MinHash. 8 blocks of 8 bits covers the near-dup
    band (Hamming <= 16 of 64) with ~90% per-pair block-collision
    probability at the band edge.
    """
    grams = _spread(df).select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), shingle_n).alias("__gr"),
    )
    hashes = grams.select(
        "__id", F.transform("__gr", lambda s: F.xxhash64(s)).alias("__hx")
    )
    sh = hashes.select("__id", simhash64(F.col("__hx")).alias("__sh"))
    blocks = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("__sh", (64 // n_blocks) * i)
                        .bitwiseAND(F.lit((1 << (64 // n_blocks)) - 1))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bb"),
    ).select("__id", "__sh", "bb.blk", "bb.val")
    a = blocks.select(
        F.col("__id").alias("doc_a"), F.col("__sh").alias("__ha"), "blk", "val"
    )
    b = blocks.select(
        F.col("__id").alias("doc_b"), F.col("__sh").alias("__hb"), "blk", "val"
    )
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
