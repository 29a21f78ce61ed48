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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before CPU-heavy
    expression stages. Small-file inputs (a single parquet file = a
    single task) would otherwise serialize shingling/hashing on one
    core; at warehouse scale the input already has enough splits and
    this is a cheap round-robin of compact rows."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _staged(df: DataFrame) -> DataFrame:
    """Persist a stage that multiple plan branches consume (the
    self-joins below reference their input twice — without this, the
    whole upstream pipeline, including the signature UDF, executes
    once PER BRANCH). ``persist`` keeps the plan pure SQL (branches
    read an InMemoryTableScan; a localCheckpoint would insert an RDD
    scan, which the plan guard forbids). The cached stage is compact —
    ids + fixed-width hash arrays, not document text. A production
    deployment materializes the same stage as a signature table in the
    lake; memory-and-disk cache is the single-job equivalent."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)


def portable_hash64(col) -> Column:
    """The shingle BASE hash (round 9): the first 128->64 bits of md5
    as a SIGNED 64-bit int — assembled from two 32-bit hex halves
    (``shiftleft(hi, 32) | lo``, wrapping into the sign bit exactly
    like DuckDB's HUGEINT-then-CAST spelling), identical across
    engines. This is what lets the MinHash/SimHash DRIVER oracles
    recompute signatures LIVE instead of pinning goldens (the
    hll_rollup_portable move applied to the dedup family). Full 64
    bits matter: a truncated hash loses SimHash fingerprint
    separation (planted-dup precision measurably degraded at 60
    bits) and shrinks the top pigeonhole block's key space. xxhash64
    stays for shuffle-key compaction (band buckets, block keys),
    where only equality matters; every value-visible signature
    derives from this hash. Can be negative: always reduce with
    ``pmod`` Spark-side and ``((h % P) + P) % P`` in oracles."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def hashed_shingle_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """(__id, __shh): one 64-bit portable hash per distinct shingle —
    the shared, persisted base every near-dedup stage derives from
    (MinHash permutations via pmod, SimHash bit votes, Jaccard
    verification), so the expensive tokenize+shingle+hash scan of the
    corpus runs exactly once per pipeline. Portable (md5-derived, see
    :func:`portable_hash64`) so the oracles recompute it in DuckDB."""
    sh = _shingled(df, id_col, text_col, shingle_n)
    return _staged(
        sh.select("__id", F.transform("__sh", portable_hash64).alias("__shh"))
    )


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


def tokens(col: Column) -> Column:
    """Normalized whitespace tokens of a text column. Stage this as a
    named projection before building shingles: the split (a regex over
    the whole document) is the most expensive scalar here and must be
    evaluated exactly once per row, not once per referencing
    expression."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (token sets saturate on small vocabularies — SURVEY.md §5.3
    — so shingle)."""
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    gram = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return F.array_distinct(
        F.when(count > 0, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (convenience
    form; hot paths stage ``tokens`` first — see shingles_from_tokens)."""
    return shingles_from_tokens(tokens(col), n)


def _shingled(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(__id, __sh) with tokens staged through a named projection so
    the document-regex split runs once per row."""
    toks = _spread(df).select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
    )
    return toks.filter(F.size("__toks") >= shingle_n).select(
        "__id", shingles_from_tokens(F.col("__toks"), shingle_n).alias("__sh")
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
    return F.transform(
        shingle_col, lambda s: F.pmod(portable_hash64(s), F.lit(_MINHASH_P))
    )


def minhash_signature_vec(num_hashes: int = 64):
    """Arrow-vectorized twin of ``minhash_signature``: identical
    integer arithmetic ((a*h + b) mod P per permutation, min over
    shingles) done in numpy per batch instead of ``num_hashes``
    interpreted higher-order-function passes per row. Bit-identical
    output (pure int64 math, no floats); ~3x faster on the signature
    stage. The JVM-expression form is kept for the pure-SQL path."""
    params = _perm_params(num_hashes)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]

    @F.pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            hv = np.asarray(h, dtype=np.int64)[None, :]
            # a < 2^31 and h < 2^31 so a*h + b < 2^63: no overflow
            out.append((A * hv + B).__mod__(_MINHASH_P).min(axis=1))
        return pd.Series(out)

    return sig


def simhash64_vec():
    """Arrow-vectorized twin of ``simhash64``: per-bit ±1 majority
    votes over the shingle-hash array, computed with numpy bit
    unpacking (exact integer math, identical fingerprints)."""
    bits = np.arange(64, dtype=np.uint64)[None, :]

    @F.pandas_udf("long")
    def fp(hx: pd.Series) -> pd.Series:
        out = np.empty(len(hx), dtype=np.int64)
        for i, h in enumerate(hx):
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)[:, None]
            votes = (((hv >> bits) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
            out[i] = ((votes > 0).astype(np.uint64) << bits[0]).sum().astype(np.uint64).astype(np.int64)
        return pd.Series(out)

    return fp


def _capped_band_pairs(
    banded: DataFrame,
    keys: list[str],
    bucket_cap: int | None,
) -> DataFrame:
    """Candidate pairs (__a < __b) from a ``(__id, *keys)`` blocking
    frame, with a hot-bucket guard (r11, VERDICT r10 #4).

    The plain equi-join on the bucket key is quadratic WITHIN a
    bucket: a degenerate corpus (billions of near-identical docs
    landing in one (band, bucket)) turns one bucket into an m^2 pair
    bomb no cluster survives. With ``bucket_cap`` set, buckets larger
    than the cap are SALTED into ``ceil(m / cap)`` deterministic
    sub-groups (xxhash64 of the id — reproducible across runs and
    engines), pairs are generated within each sub-group, and one
    chain of BRIDGE pairs links consecutive sub-group representatives
    (min id per group, ordered by salt) so the bucket stays one
    connected component.

    Cost: a super-bucket emits O(m * cap) within-group pairs + g - 1
    bridges instead of O(m^2). Recall effect (documented contract):
    within-bucket PAIRWISE recall drops — cross-group pairs are not
    emitted — but CLUSTER-level connectivity survives whenever the
    bucket's members are mutually near-duplicates (the only corpus
    shape that produces super-buckets from 16-band MinHash in
    practice), because every bridge pair then verifies at the same
    similarity as any other within-bucket pair. Buckets at or under
    the cap are byte-identical to the unguarded path, and the
    measured max bucket size on the test corpora is 4 (sf0.1), so the
    default cap of 1024 never fires there — the DuckDB oracles stay
    exact. The guard counts buckets with a partial-aggregated groupBy
    (no skewed window sort); the bucket-size table joins back at
    bucket cardinality (AQE broadcasts it in the common case) and
    every row is salted uniformly — cold buckets get exactly one
    sub-group, so their pairs are the unguarded pairs."""
    if bucket_cap is not None and bucket_cap < 2:
        raise ValueError(f"bucket_cap must be >= 2, got {bucket_cap}")
    # the self-join consumes the banding pipeline in both branches —
    # stage it once (compact: id + band/bucket longs); with a cap the
    # probe below also reads this frame, populating the cache
    staged = _staged(banded)
    unguarded = (
        staged.select(F.col("__id").alias("__a"), *keys)
        .join(staged.select(F.col("__id").alias("__b"), *keys), keys)
        .filter(F.col("__a") < F.col("__b"))
        .select("__a", "__b")
        .distinct()
    )
    if bucket_cap is None:
        return unguarded
    # r12 guard restructure (VERDICT r11 #2 — make the guard FREE when
    # cold): probe the TINY bucket-size aggregate, not a full salted
    # frame. r11 salted every row up front, which taxed every healthy
    # corpus with a sizes join + a second persist + an eager probe over
    # the full frame; the cold path (every bucket at or under the cap —
    # every real corpus measured) now emits the EXACT unguarded r10
    # plan over the staged banding frame, and only genuinely hot
    # corpora pay for salting. The probe's aggregate is
    # partial-aggregated (bucket-cardinality rows shuffle, not docs)
    # and its action warms the cache the pair join reads.
    sizes = staged.groupBy(*keys).agg(F.count("*").alias("__bsz"))
    if sizes.filter(F.col("__bsz") > bucket_cap).isEmpty():
        return unguarded
    # hot path: salt EVERY row uniformly (cold buckets get exactly one
    # sub-group — pmod(xxhash64, 1) == 0 — so their pairs are the
    # unguarded pairs); the single (keys, salt) pair join bounds the
    # super-buckets, and a bridge chain keeps each one connected. The
    # sizes side aggregates to bucket cardinality, so AQE broadcasts
    # it in the common case.
    salted = _staged(
        staged.join(sizes, keys).select(
            "__id",
            *keys,
            F.pmod(
                F.xxhash64("__id"),
                F.ceil(F.col("__bsz") / F.lit(bucket_cap)).cast("long"),
            ).alias("__salt"),
            (F.col("__bsz") > bucket_cap).alias("__hot"),
        )
    )
    skeys = keys + ["__salt"]
    pairs_all = (
        salted.select(F.col("__id").alias("__a"), *skeys)
        .join(salted.select(F.col("__id").alias("__b"), *skeys), skeys)
        .filter(F.col("__a") < F.col("__b"))
        .select("__a", "__b")
    )
    # bridge chain: consecutive sub-group representatives per bucket
    # (only super-cap buckets have more than one sub-group)
    reps = (
        salted.filter(F.col("__hot"))
        .groupBy(*skeys)
        .agg(F.min("__id").alias("__rep"))
    )
    w = Window.partitionBy(*keys).orderBy("__salt")
    chained = reps.select(
        *keys, "__rep", F.row_number().over(w).alias("__rn")
    )
    bridges = (
        chained.select(*keys, F.col("__rep").alias("__ra"), "__rn")
        .join(
            chained.select(
                *keys,
                F.col("__rep").alias("__rb"),
                (F.col("__rn") - 1).alias("__rn"),
            ),
            keys + ["__rn"],
        )
        .select(
            F.least("__ra", "__rb").alias("__a"),
            F.greatest("__ra", "__rb").alias("__b"),
        )
    )
    return pairs_all.unionByName(bridges).distinct()


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hashed: DataFrame | None = None,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature
    become a candidate pair (doc_a < doc_b).

    Plan shape: explode to ``bands`` rows per doc, equi-join on
    (band_id, band_hash) — linear work + one shuffle; no cross join.
    ``hashed`` optionally supplies a precomputed
    ``hashed_shingle_frame`` shared with the verification stage.
    ``bucket_cap`` guards degenerate corpora: buckets above the cap
    are salted into bounded sub-groups with a bridge chain — see
    ``_capped_band_pairs`` for the exact recall contract.
    """
    rows_per_band = num_hashes // bands
    # staged projections: tokens -> shingles -> base hashes ->
    # signature, each a materialized column so no stage's expression is
    # duplicated; the banding self-join's shared stage is the BANDED
    # frame, persisted inside _capped_band_pairs (r12 — staging the
    # signature here too would be a redundant second persist of the
    # same pipeline: sig has exactly one consumer, the explode below)
    if hashed is None:
        hashed = hashed_shingle_frame(df, id_col, text_col, shingle_n)
    hs = hashed.select(
        "__id",
        F.transform("__shh", lambda x: F.pmod(x, F.lit(_MINHASH_P))).alias("__hs"),
    )
    sig = hs.select(
        "__id", minhash_signature_vec(num_hashes)(F.col("__hs")).alias("__sig")
    )
    # coalesce: bucket is always non-null, but its lineage runs through
    # the signature UDF, so Catalyst would otherwise infer
    # isnotnull(bucket) at the join and push the inlined signature
    # pipeline below the repartition (see simhash_near_dup_pairs note)
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.coalesce(
                            F.xxhash64(
                                F.array_join(
                                    F.transform(
                                        F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                                        lambda x: x.cast("string"),
                                    ),
                                    ",",
                                )
                            ),
                            F.lit(0),
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    return _capped_band_pairs(banded, ["band", "bucket"], bucket_cap).select(
        F.col("__a").alias("doc_a"), F.col("__b").alias("doc_b")
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard (computed
    over the hashed shingle sets — see ngram_near_dup_pairs note (2);
    per-doc set sizes precomputed per vector, not per pair).
    ``hashed`` optionally supplies a precomputed, persisted
    ``hashed_shingle_frame`` (shared with candidate generation)."""
    if hashed is None:
        hashed = hashed_shingle_frame(df, id_col, text_col, shingle_n)
    sh = hashed.withColumn("__nsh", F.size("__shh").cast("double"))
    a = sh.select(
        F.col("__id").alias("doc_a"), F.col("__shh").alias("__sa"),
        F.col("__nsh").alias("__na"),
    )
    b = sh.select(
        F.col("__id").alias("doc_b"), F.col("__shh").alias("__sb"),
        F.col("__nsh").alias("__nb"),
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.col("__na") + F.col("__nb") - inter
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
    hashed: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash near-dedup: LSH candidates -> exact Jaccard filter.

    The hashed-shingle base is computed once and shared between the
    LSH candidate stage and the Jaccard verification stage (three plan
    branches total) instead of re-shingling the corpus per branch;
    pass ``hashed`` to share it wider across a multi-method pipeline."""
    if hashed is None:
        hashed = hashed_shingle_frame(df, id_col, text_col, shingle_n)
    cands = minhash_candidates(
        df, id_col, text_col, shingle_n, num_hashes, bands, hashed=hashed
    )
    return jaccard_pairs(
        df, cands, id_col, text_col, shingle_n, hashed=hashed
    ).filter(F.col("jaccard") >= threshold)


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


def _min_shingle_rep(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """Unpersisted (``__id``, ``__mink``, ``__minh``, ``__shh``,
    ``__nsh``) representation — the ONE definition every min-shingle
    consumer (self-join blocking, incremental ingest, the persisted
    signature lake) derives from, so the hashing/min-key conventions
    can never desynchronize between them."""
    sh = _shingled(df, id_col, text_col, shingle_n).withColumn(
        "__mink", F.coalesce(F.array_min("__sh"), F.lit(""))
    )
    return sh.select(
        "__id",
        "__mink",
        F.xxhash64("__mink").alias("__minh"),  # blocking key: equality only
        F.transform("__sh", portable_hash64).alias("__shh"),
    ).withColumn("__nsh", F.size("__shh").cast("double"))


def min_shingle_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """The staged (persisted) ``_min_shingle_rep`` that min-shingle
    blocking operators (``ngram_near_dup_pairs``, ``jaccard_topk``)
    consume in multiple plan branches — exposed so a pipeline running
    several of them shares ONE tokenize+shingle+hash pass (the same
    discipline as ``hashed_shingle_frame`` for the signature
    family)."""
    return _staged(_min_shingle_rep(df, id_col, text_col, shingle_n))


def ngram_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    minsh: DataFrame | None = None,
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
    # coalesce makes the blocking key provably non-null (it always is:
    # _shingled guarantees >= 1 shingle): otherwise the join's inferred
    # isnotnull(key) predicate inlines the WHOLE shingle pipeline and
    # gets pushed below the _spread repartition, re-computing every
    # shingle in the single-task parquet-scan stage (measured 3.6s of
    # the query's 4s at sf0.1)
    # Two hot-path representation choices, both exactness-preserving:
    # (1) join on the 64-bit hash of the blocking key, not the key
    #     string — hashed-relation probing on longs measured 7x faster
    #     than on variable-length min-shingle strings; the post-join
    #     equality filter on the actual strings restores exact blocking
    #     semantics (a collision could only ADD a candidate, and the
    #     filter removes it);
    # (2) verify Jaccard on the HASHED shingle sets (array<long>), not
    #     the string sets — array_intersect is re-evaluated by both the
    #     pushed-down threshold predicate and the output projection, so
    #     each evaluation must be cheap; per-doc set sizes are also
    #     precomputed (per-vector, not per-pair — same discipline as
    #     the cosine norms in operators.similarity).
    # _staged (inside min_shingle_frame): the blocking self-join
    # consumes this in both branches — persist so the shingle pipeline
    # runs once, not per branch
    sh = (
        minsh
        if minsh is not None
        else min_shingle_frame(df, id_col, text_col, shingle_n)
    )
    a = sh.select(
        F.col("__id").alias("doc_a"), F.col("__shh").alias("__sa"),
        F.col("__nsh").alias("__na"), F.col("__mink").alias("__minka"), "__minh",
    )
    b = sh.select(
        F.col("__id").alias("doc_b"), F.col("__shh").alias("__sb"),
        F.col("__nsh").alias("__nb"), F.col("__mink").alias("__minkb"), "__minh",
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.col("__na") + F.col("__nb") - inter
    jac = inter / union
    # NOTE the string-equality verify is spelled as <= AND >= : a plain
    # == would be extracted by ExtractEquiJoinKeys into a join KEY,
    # putting variable-length strings back into the hashed relation
    # (the 7x slowdown (1) avoids); the range spelling stays a cheap
    # residual filter over matched pairs only
    return (
        a.join(b, ["__minh"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("__minka") <= F.col("__minkb"))
            & (F.col("__minka") >= F.col("__minkb"))
        )
        .withColumn("__jac", jac)
        .filter(F.col("__jac") >= threshold)
        .select("doc_a", "doc_b", round_duck("__jac", 4).alias("jac"))
    )


def jaccard_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    minsh: DataFrame | None = None,
) -> DataFrame:
    """Top-k most-similar documents PER document by exact shingle
    Jaccard among min-shingle block mates — the retrieval twin of
    ``ngram_near_dup_pairs`` (similar-document search / provenance
    lookup rather than symmetric dedup pairs): every document is a
    query, candidates are its blocking-key mates, ranking is exact
    Jaccard desc with id tiebreak.

    Same scale shape and the same three hot-path choices as the dedup
    form (hashed blocking key, hashed-set Jaccard, staged self-join
    input); the ranking adds one window over (doc_id), partitioned by
    the join's own output key. Because blocking is a deterministic
    function of text (lexicographic min shingle), the whole operator
    is SQL-expressible and live-oracle-checked. Docs sharing a block
    always intersect in >= the min shingle, so jac > 0 for every
    returned row. Output: (doc_id, match_id, jac, rn<=k).
    """
    from pyspark.sql import Window

    sh = (
        minsh
        if minsh is not None
        else min_shingle_frame(df, id_col, text_col, shingle_n)
    )
    a = sh.select(
        F.col("__id").alias("doc_id"), F.col("__shh").alias("__sa"),
        F.col("__nsh").alias("__na"), F.col("__mink").alias("__minka"),
        "__minh",
    )
    b = sh.select(
        F.col("__id").alias("match_id"), F.col("__shh").alias("__sb"),
        F.col("__nsh").alias("__nb"), F.col("__mink").alias("__minkb"),
        "__minh",
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.col("__na") + F.col("__nb") - inter
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("__jac"), F.col("match_id")
    )
    # <=/>= residual spelling for the same ExtractEquiJoinKeys reason
    # as ngram_near_dup_pairs
    return (
        a.join(b, ["__minh"])
        .filter(
            (F.col("doc_id") != F.col("match_id"))
            & (F.col("__minka") <= F.col("__minkb"))
            & (F.col("__minka") >= F.col("__minkb"))
        )
        .withColumn("__jac", inter / union)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            "doc_id", "match_id", round_duck("__jac", 4).alias("jac"), "rn"
        )
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 16,
    n_blocks: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    combine_blocks: int = 1,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, pigeonhole
    blocking on ``n_blocks`` bit-blocks, then exact bit_count
    verification (``hamming <= max_hamming``). Linear work + equi-join
    — the same no-cross-join discipline as MinHash.

    Recall contract (``combine_blocks=1``): a pair at Hamming
    distance d shares at least one block whenever d < n_blocks
    (pigeonhole), so the default ``n_blocks = max_hamming + 1`` makes
    the returned set EXACTLY the pairs within ``max_hamming`` — no
    silent misses. Passing a smaller ``n_blocks`` explicitly trades
    that guarantee for fewer candidate collisions: recall then only
    holds for d < n_blocks, and pairs in (n_blocks-1, max_hamming]
    are found with decaying probability. Blocks are near-equal width
    (64/n_blocks rounded), which the pigeonhole argument does not
    require to be uniform.

    ``combine_blocks=2`` is the SCALE knob (SCALING.md "SimHash
    blocking"): the single-block key space is only ~2^(64/n_blocks)
    values, so bucket occupancy — and candidate pairs, a birthday
    process — grows quadratically with corpus size. Combination keys
    join on ORDERED PAIRS of block values instead: d mismatched bits
    can dirty at most d blocks, leaving n_blocks - d clean, and any
    two clean blocks collide — so with the combine-2 default
    ``n_blocks = max_hamming + 2`` recall stays exact for
    d <= max_hamming while the key space squares, collapsing bucket
    sizes. Measured at the 30x tile (150k docs, max_hamming=8):
    candidate pairs 770M -> 83M (9.3x), identical verified output.
    Wall-clock does NOT improve yet at that size — the whole-stage-
    codegen bit_count verify streams ~50M candidates/s, so the
    C(n_blocks, 2)-row explode costs more than the verify saves; the
    knob pays when the quadratically-growing candidate term
    dominates (corpora another order beyond), and past THAT the real
    answer is a wider fingerprint (both schemes' key spaces are
    fixed, so both are asymptotically quadratic — combine-2 just
    moves the crossover ~two orders out).
    """
    if combine_blocks not in (1, 2):
        raise ValueError(f"combine_blocks must be 1 or 2, got {combine_blocks}")
    if n_blocks is None:
        n_blocks = max_hamming + combine_blocks
    # n_blocks >= 2: a single 64-bit block's value mask (1<<64)-1
    # overflows LongType — and max_hamming=0 (its only producer) is
    # exact duplicate detection, which is the hash-groupBy operator's
    # job, not a blocking scheme's
    if not max(2, combine_blocks) <= n_blocks <= 64:
        raise ValueError(
            f"n_blocks must be in [{max(2, combine_blocks)}, 64], got {n_blocks}"
        )
    width, extra = divmod(64, n_blocks)
    widths = [width + 1] * extra + [width] * (n_blocks - extra)
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    hashes = (
        hashed
        if hashed is not None
        else hashed_shingle_frame(df, id_col, text_col, shingle_n)
    )
    # coalesce: the fingerprint is always non-null, but Catalyst can't
    # prove a UDF output is — without this, the join's inferred
    # isnotnull(val) inlines the WHOLE pipeline (split+shingles+UDF)
    # and pushes it below the _spread repartition, re-running it
    # single-threaded in the scan task (measured 3.4s at sf0.1; see
    # the same note in ngram_near_dup_pairs)
    # _staged: the block self-join consumes the fingerprints in both
    # branches — persist so the UDF runs once, not per branch
    sh = _staged(
        hashes.select(
            "__id",
            F.coalesce(simhash64_vec()(F.col("__shh")), F.lit(0)).alias("__sh"),
        )
    )
    def _blk_val(i):
        return F.shiftrightunsigned("__sh", offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    if combine_blocks == 1:
        keys = [
            F.struct(F.lit(i).alias("blk"), _blk_val(i).alias("val"))
            for i in range(n_blocks)
        ]
    else:
        # ordered pair (i, j): key id i*64+j, value = v_i packed above
        # v_j via shiftleft|OR — bit-level packing, not arithmetic:
        # v_i can be a full 32-bit block (n_blocks=2), and
        # v_i * 2^32 would overflow a signed long for v_i >= 2^31
        # (ANSI mode throws); shiftleft just sets the high bits, is
        # injective for widths <= 32, and never overflows
        keys = [
            F.struct(
                F.lit(i * 64 + j).alias("blk"),
                F.shiftleft(_blk_val(i), 32)
                .bitwiseOR(_blk_val(j))
                .alias("val"),
            )
            for i in range(n_blocks)
            for j in range(i + 1, n_blocks)
        ]
    blocks = sh.select(
        "__id",
        "__sh",
        F.explode(F.array(*keys)).alias("bb"),
    ).select("__id", "__sh", "bb.blk", "bb.val")
    a = blocks.select(
        F.col("__id").alias("doc_a"), F.col("__sh").alias("__ha"), "blk", "val"
    )
    b = blocks.select(
        F.col("__id").alias("doc_b"), F.col("__sh").alias("__hb"), "blk", "val"
    )
    # evaluate the (cheap) Hamming verify on the raw join output and
    # filter BEFORE the distinct: the per-pair block-collision fan-out
    # (up to n_blocks rows per pair) then never reaches the dedup
    # shuffle — only verified near-dup pairs do
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash128_vec():
    """Arrow-vectorized 128-bit SimHash fingerprints as ``[lo, hi]``
    (two signed longs).

    Word 0 (bits 0-63) votes on the base xxhash64 shingle hashes —
    bit-identical to ``simhash64_vec`` output (cross-checked in
    tests/test_simhash128.py); word 1 votes on a splitmix64 remix of
    each shingle hash (Steele et al., "Fast Splittable Pseudorandom
    Number Generators", OOPSLA 2014 — the standard 64->64 finalizer),
    which supplies 64 additional independent hyperplanes without a
    second tokenize/shingle pass over the corpus.

    Why a wider fingerprint exists (SCALING.md "SimHash blocking"):
    pigeonhole blocking's per-block key space is ``2^(bits /
    (max_hamming + c))`` — at a FIXED angular threshold the exact-
    recall block width is invariant in fingerprint size (max_hamming
    scales with bits), but the tight-threshold regime LLM dedup
    actually runs (near-exact dups, hamming <= 8) keeps max_hamming
    ABSOLUTE, so doubling the bits doubles the block width: 13-bit
    blocks instead of 7-bit, squaring the single-block key space and
    quartering it again under combination keys.
    """
    bits = np.arange(64, dtype=np.uint64)[None, :]

    @F.pandas_udf("array<long>")
    def fp(hx: pd.Series) -> pd.Series:
        out = []
        for h in hx:
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
            # splitmix64 finalizer: independent second word per shingle
            z = hv + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            words = []
            for w in (hv, z):
                votes = (((w[:, None] >> bits) & 1).astype(np.int64) * 2 - 1).sum(
                    axis=0
                )
                words.append(
                    int(
                        ((votes > 0).astype(np.uint64) << bits[0])
                        .sum()
                        .astype(np.uint64)
                        .astype(np.int64)
                    )
                )
            out.append(words)
        return pd.Series(out)

    return fp


def simhash128_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    n_blocks: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    combine_blocks: int = 2,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """128-bit SimHash near-dup pairs with Manku-style combination-
    block keys (Manku, Jain & Das Sarma, "Detecting Near-Duplicates
    for Web Crawling", WWW 2007 — their permuted-table scheme is
    exactly "join on every C(n_blocks, c) combination of c blocks").

    Recall contract (pigeonhole, same argument as the 64-bit
    operator's combine-2 case generalized): d mismatched bits dirty at
    most d blocks, so with ``n_blocks = max_hamming + combine_blocks``
    every pair within ``max_hamming`` shares at least ``combine_blocks``
    clean blocks — i.e. collides on at least one combination key.
    The returned set is then EXACTLY the pairs with 128-bit Hamming
    distance <= max_hamming (verified pair-for-pair against numpy
    brute force in tests).

    Key-space arithmetic at the defaults (max_hamming=8, c=2):
    n_blocks=10 -> ~13-bit blocks -> ~26-bit combination keys, versus
    the 64-bit operator's 14-bit combine-2 keys — 4096x more key
    values, pushing the birthday-process candidate blowup another ~2
    orders of corpus size out, at the same C(10,2)=45 rows/doc explode
    the 64-bit combine-2 already pays. Combination keys are hashed
    (xxhash64 over the block values + block-set id) rather than
    bit-packed: hash collisions only ADD candidates, and the exact
    bit_count verify removes them, so correctness is unaffected while
    the key stays one long for any c.

    Scale shape: identical to ``simhash_near_dup_pairs`` — linear
    fingerprint pass, explode to C(n_blocks, c) key rows, equi-join,
    codegen bit_count verify on the raw join output, distinct last.
    """
    if combine_blocks not in (1, 2, 3):
        raise ValueError(
            f"combine_blocks must be 1, 2 or 3, got {combine_blocks}"
        )
    if n_blocks is None:
        n_blocks = max_hamming + combine_blocks
    # n_blocks >= 3 keeps every block under 64 bits (width <= ceil(128/3)
    # = 43): at n_blocks <= 2 the value mask (1<<64)-1 overflows
    # LongType — and the max_hamming<=1 settings that produce such
    # configs are exact-dup territory (hash groupBy), not blocking
    if not max(3, combine_blocks) <= n_blocks <= 128:
        raise ValueError(
            f"n_blocks must be in [{max(3, combine_blocks)}, 128], got {n_blocks}"
        )
    width, extra = divmod(128, n_blocks)
    widths = [width + 1] * extra + [width] * (n_blocks - extra)
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    hashes = (
        hashed
        if hashed is not None
        else hashed_shingle_frame(df, id_col, text_col, shingle_n)
    )
    # coalesce + _staged: same two hazards as simhash_near_dup_pairs
    # (Catalyst can't prove UDF outputs non-null -> inferred isnotnull
    # re-inlines the pipeline below the repartition; the self-join
    # consumes the fingerprint in both branches)
    # the UDF output is persisted BEFORE the lo/hi projection so the
    # fingerprint pass runs exactly once (two element_at references to
    # an inline UDF column would re-evaluate it after CollapseProject)
    fp = _staged(
        hashes.select(
            "__id", simhash128_vec()(F.col("__shh")).alias("__fp")
        )
    )
    sh = fp.select(
        "__id",
        F.coalesce(F.element_at("__fp", 1), F.lit(0)).alias("__lo"),
        F.coalesce(F.element_at("__fp", 2), F.lit(0)).alias("__hi"),
    )

    def _blk_val(i):
        """Bits [offsets[i], offsets[i]+widths[i]) of the 128-bit
        fingerprint laid out as lo = bits 0-63, hi = bits 64-127; a
        block may straddle the word boundary."""
        off, w = offsets[i], widths[i]
        mask = F.lit((1 << w) - 1)
        if off + w <= 64:
            return F.shiftrightunsigned("__lo", off).bitwiseAND(mask)
        if off >= 64:
            return F.shiftrightunsigned("__hi", off - 64).bitwiseAND(mask)
        lo_bits = 64 - off
        low = F.shiftrightunsigned("__lo", off)  # top bits already 0
        high = F.col("__hi").bitwiseAND(F.lit((1 << (w - lo_bits)) - 1))
        return F.shiftleft(high, lo_bits).bitwiseOR(low)

    from itertools import combinations

    combos = list(combinations(range(n_blocks), combine_blocks))
    keys = [
        F.xxhash64(F.lit(ci), *[_blk_val(i) for i in combo])
        for ci, combo in enumerate(combos)
    ]
    blocks = sh.select(
        "__id", "__lo", "__hi", F.explode(F.array(*keys)).alias("__key")
    )
    a = blocks.select(
        F.col("__id").alias("doc_a"),
        F.col("__lo").alias("__la"),
        F.col("__hi").alias("__ha"),
        "__key",
    )
    b = blocks.select(
        F.col("__id").alias("doc_b"),
        F.col("__lo").alias("__lb"),
        F.col("__hi").alias("__hb"),
        "__key",
    )
    hamming = F.bit_count(F.col("__la").bitwiseXOR(F.col("__lb"))) + F.bit_count(
        F.col("__ha").bitwiseXOR(F.col("__hb"))
    )
    # verify-then-distinct: only true near-dup pairs reach the dedup
    # shuffle (hash-collision and multi-combination fan-in included)
    return (
        a.join(b, ["__key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicated_spans(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """Exact duplicated-substring spans (the distributed shape of Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — their suffix-array pass finds corpus-repeated
    substrings; here the unit is the token n-gram, the granularity a
    Spark pipeline can do with two linear shuffles instead of a
    suffix array).

    A position is *duplicated* when its n-gram occurs >= ``min_count``
    times corpus-wide (within-document repeats count: boilerplate
    repeated inside one page is exactly what curation wants flagged).
    Overlapping/adjacent duplicated n-grams merge into maximal spans
    per document — gaps-and-islands over the start positions, break
    when the next start no longer overlaps (gap > n).

    Output: (doc_id, span_start, span_end, span_tokens, n_dup_grams),
    token indices 0-based inclusive.

    Scale shape: positional explode (linear, ~len rows/doc) ->
    partial-agg groupBy on the n-gram key -> LEFT SEMI equi-join of
    positions against the >=min_count keys -> per-doc window for the
    island merge. The count uses groupBy + semi-join, NOT a count
    window over the key: a hot boilerplate n-gram would put its whole
    corpus-wide occurrence list in one window partition, while the
    groupBy partial-aggregates map-side and the join's skew is
    AQE-split. Keys shuffle as xxhash64(ngram) (8 bytes), not the
    n-gram text; the DuckDB oracle groups by the raw string and
    matches because the output never exposes the key (a 64-bit
    collision would need ~2^32 distinct n-grams in one corpus —
    revisit the key width at that scale)."""
    from pyspark.sql import Window

    # toks: optionally a precomputed/staged (doc_id, __toks) frame so
    # a caller that also needs token counts (boilerplate_fraction)
    # pays the document-regex split once, not twice
    if toks is None:
        toks = _spread(df).select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
    grams = (
        toks.filter(F.size("__toks") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    lambda i: F.xxhash64(F.array_join(F.slice("__toks", i + 1, n), " ")),
                )
            ).alias("pos", "__k"),
        )
    )
    # the semi-join consumes grams on one side and its aggregate on
    # the other — stage so the tokenize+explode pass runs once
    grams = _staged(grams)
    hot = (
        grams.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__k")
    )
    dup_pos = grams.join(hot, "__k", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    new_island = F.when(
        F.col("pos") - F.lag("pos").over(w) <= F.lit(n), F.lit(0)
    ).otherwise(F.lit(1))
    running = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dup_pos.withColumn("__new", new_island)
        .withColumn("__island", running)
        .groupBy("doc_id", "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
    )


def boilerplate_fraction(
    df: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplication fraction — the curation-facing rollup
    of ``duplicated_spans`` (CCNet/Lee-et-al-style boilerplate
    signal): the share of a document's token positions covered by
    maximal spans whose ``n``-grams repeat >= ``min_count`` times
    corpus-wide. High values flag boilerplate/templated pages for the
    quality-filter stage. Output: (doc_id, n_tokens, dup_tokens,
    dup_frac), one row per input document (0.0 when no span).

    Scale shape: the spans pipeline (linear + one keyed shuffle; see
    ``duplicated_spans``) plus a per-doc partial-agg sum and a left
    join back to the token counts — nothing new shuffles more than
    once."""
    # one tokenize pass: the staged token projection feeds BOTH the
    # spans pipeline and the per-doc token counts
    toks = _staged(
        _spread(df).select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
    )
    spans = duplicated_spans(df, n, min_count, id_col, text_col, toks=toks)
    ntok = toks.select(
        "doc_id", F.size("__toks").cast("long").alias("n_tokens")
    )
    per = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("__dup")
    )
    dup = F.coalesce(F.col("__dup"), F.lit(0)).cast("long")
    return ntok.join(per, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        dup.alias("dup_tokens"),
        round_duck(dup.cast("double") / F.col("n_tokens"), 4).alias(
            "dup_frac"
        ),
    )


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-cluster manifest: MinHash-LSH near-dup pairs ->
    connected components -> one canonical doc per cluster. This is the
    step a production dedup actually ships — pairwise output alone
    can't answer "which rows do I keep" when duplicates chain
    (A~B, B~C but A!~C must still collapse to one survivor).

    Returns every document labeled ``(id_col, cluster, cluster_size,
    keep)`` where ``cluster`` is the component's minimum doc id (the
    canonical survivor, ``keep=true``; singletons keep themselves).

    Scale shape: the pair stage is the banded equi-join of
    ``near_dup_pairs_minhash`` (no cross join), and the component
    stage is the Pregel-lite min-label loop of
    ``operators.iterative.connected_components`` — iterations ~
    cluster diameter, which for dedup graphs is tiny (dups are
    near-cliques). The full-corpus ``vertices`` pass labels
    non-duplicated docs as their own singleton clusters.
    """
    from flink_framework_spark.operators.iterative import connected_components

    pairs = near_dup_pairs_minhash(
        df, threshold=threshold, id_col=id_col, text_col=text_col
    )
    # CC only over edge endpoints (the duplicated minority — ~5-10% of
    # a typical corpus): the min-label loop then iterates over a frame
    # proportional to the DUP set, not the corpus. Singletons never
    # enter the loop; they are attached afterward as their own cluster
    # via a left join (coalesce to self).
    labeled = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    from pyspark.sql import Window

    size_w = Window.partitionBy("cluster")
    return (
        df.select(F.col(id_col))
        .join(labeled.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
        .select(
            id_col,
            "cluster",
            F.count(F.lit(1)).over(size_w).alias("cluster_size"),
            (F.col(id_col) == F.col("cluster")).alias("keep"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Typo-level near-dedup: all pairs of rows whose ``str_col``
    values are within Levenshtein distance 1, via SYMMETRIC-DELETE
    blocking (the SymSpell scheme): two strings within distance 1
    necessarily share a key in {s} ∪ {s minus one character}, so
    candidate generation is an explode (|s|+1 keys per row, a narrow
    map) + one equi-join on the key — never a cross join — and the
    exact ``levenshtein`` verify runs on candidates only. Guaranteed
    recall at distance <= 1; ``max_dist`` is fixed at 1 because the
    delete-neighborhood grows as |s|^d (the standard SymSpell
    trade-off — for coarser matching use the shingle/MinHash ops).

    Returns (id_a, id_b, dist) with id_a < id_b, one row per pair.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "symmetric-delete blocking is implemented for max_dist=1"
        )
    s = F.col("__s")
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1),
            F.substr(s, i + 1, F.length(s)),
        ),
    )
    keyed = _staged(
        _spread(
            df.select(F.col(id_col), F.col(str_col).alias("__s"))
        ).select(
            id_col,
            "__s",
            F.explode(
                F.array_distinct(F.array_union(F.array(s), deletes))
            ).alias("__k"),
        )
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("__s").alias("__sa"), "__k"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("__s").alias("__sb"), "__k"
    )
    return (
        a.join(b, "__k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def incremental_dedup_ngram(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    new_minsh: DataFrame | None = None,
    corpus_minsh: DataFrame | None = None,
) -> DataFrame:
    """Incremental (cross-batch) near-dedup: drop NEW documents that
    near-duplicate the EXISTING corpus — the production ingest shape,
    where each crawl batch dedups against the accumulated lake
    without re-clustering it. Candidate generation joins the new
    side's min-shingle blocking keys against the corpus side ONLY:
    cost is |new| x collision-rate, never corpus x corpus. Same
    hashed-key + hashed-set verification discipline as
    ``ngram_near_dup_pairs`` (see the notes there); intra-batch dups
    among the new docs are the existing self-join operator's job.

    Returns the surviving rows of ``new_df`` (left anti on the dup
    id set).

    ``corpus_minsh`` / ``new_minsh``: precomputed
    ``min_shingle_frame``-shaped frames. A real deployment persists
    the corpus side as a SIGNATURE table in the lake (see
    ``streaming.rolling_dedup``) — without it, every ingest round
    re-tokenizes the ENTIRE accumulated corpus, an O(corpus) text
    pass per batch that dwarfs the |new|-sized join at scale. With
    it, the corpus text is never touched: the round reads fixed-width
    hash rows, and ``corpus_df`` may be None.
    """
    if corpus_df is None and corpus_minsh is None:
        raise ValueError("need corpus_df or corpus_minsh")

    def rep(df: DataFrame) -> DataFrame:
        return _min_shingle_rep(df, id_col, text_col, shingle_n)

    nrep = new_minsh if new_minsh is not None else rep(new_df)
    crep = corpus_minsh if corpus_minsh is not None else rep(corpus_df)
    n = nrep.select(
        F.col("__id").alias("__nid"), F.col("__shh").alias("__sa"),
        F.col("__nsh").alias("__na"), F.col("__mink").alias("__minka"), "__minh",
    )
    c = crep.select(
        F.col("__shh").alias("__sb"), F.col("__nsh").alias("__nb"),
        F.col("__mink").alias("__minkb"), "__minh",
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.col("__na") + F.col("__nb") - inter
    dup_ids = (
        n.join(c, ["__minh"])
        .filter(
            (F.col("__minka") <= F.col("__minkb"))
            & (F.col("__minka") >= F.col("__minkb"))
        )
        .filter(inter / union >= threshold)
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    return new_df.join(dup_ids, id_col, "left_anti")
