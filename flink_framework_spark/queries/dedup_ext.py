"""K1/K2 extended: near-duplicate detection queries — n-gram Jaccard
(oracle-checked via min-shingle blocking), embedding-cosine pairs
(oracle-checked), MinHash-LSH and SimHash (rows-only here; quality
properties tested with planted duplicates in tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.dedup import (
    boilerplate_fraction,
    dedup_clusters,
    duplicated_spans,
    edit_distance_pairs,
    incremental_dedup_ngram,
    jaccard_topk,
    near_dup_pairs_minhash,
    ngram_near_dup_pairs,
    simhash128_near_dup_pairs,
    simhash_near_dup_pairs,
)
from flink_framework_spark.operators.similarity import embedding_near_dup_pairs
from flink_framework_spark.queries._oracle_trained import (
    embed_cells_select_sql,
    per_sf,
)
from flink_framework_spark.registry import register


@register(
    "q_dedup_ngram",
    family="K",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3),
kb AS (SELECT doc_id, s, list_sort(s)[1] AS mink FROM sh)
SELECT doc_a, doc_b, ROUND(jac, 4) AS jac FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
  FROM kb a JOIN kb b ON a.mink = b.mink AND a.doc_id < b.doc_id) t
WHERE jac >= 0.5
""",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup pairs, min-shingle (1-permutation
    MinHash) blocking — recovers all planted near-dups on the fixtures
    from ~0.1% of the all-pairs candidate space (operators.dedup)."""
    return ngram_near_dup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5
    )


# the full duplicated-spans pipeline in DuckDB, shared by the spans
# query and the boilerplate-fraction query built on top of it
_SPANS_SQL_BODY = r"""
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM documents),
ng AS (
  SELECT doc_id,
         unnest(range(1, len(tk) - 6)) - 1 AS pos,
         unnest([array_to_string(tk[i:i+7], ' ')
                 for i in range(1, len(tk) - 6)]) AS g
  FROM toks WHERE len(tk) >= 8),
hot AS (SELECT g FROM ng GROUP BY g HAVING COUNT(*) >= 2),
dp AS (SELECT doc_id, pos FROM ng WHERE g IN (SELECT g FROM hot)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
              THEN 0 ELSE 1 END AS nw
  FROM dp),
run AS (
  SELECT doc_id, pos,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM isl),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
         MAX(pos) + 7 - MIN(pos) + 1 AS span_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_dup_grams
  FROM run GROUP BY doc_id, island)
"""


@register(
    "q_dedup_spans",
    family="K",
    oracle=f"WITH {_SPANS_SQL_BODY} SELECT * FROM spans",
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2022 shape at
    token-8-gram granularity): positions whose 8-gram repeats
    corpus-wide, merged into maximal per-doc spans
    (operators.dedup.duplicated_spans). Live SQL oracle — the whole
    pipeline (positional n-grams, corpus counts, gaps-and-islands
    merge) is re-expressed in DuckDB."""
    return duplicated_spans(table(spark, sf_dir, "documents"), n=8, min_count=2)


@register(
    "q_boilerplate",
    family="K",
    oracle=f"""
WITH {_SPANS_SQL_BODY},
nt AS (
  SELECT doc_id,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents),
agg AS (
  SELECT doc_id, CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id)
SELECT nt.doc_id, nt.n_tokens,
       COALESCE(a.dup_tokens, 0) AS dup_tokens,
       ROUND(CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / nt.n_tokens,
             4) AS dup_frac
FROM nt LEFT JOIN agg a USING (doc_id)
""",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate/duplication fraction: share of token
    positions covered by corpus-repeated 8-gram spans — the
    quality-filter rollup of q_dedup_spans
    (operators.dedup.boilerplate_fraction). Live SQL oracle over the
    full spans + coverage pipeline."""
    return boilerplate_fraction(
        table(spark, sf_dir, "documents"), n=8, min_count=2
    )


@register(
    "q_dedup_embed",
    family="K",
    oracle="""
SELECT vec_a, vec_b, ROUND(cos, 4) AS cosim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id) t
WHERE cos >= 0.4
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucketed by the coarse label
    (IVF-cell discipline: no cross join at any scale)."""
    return embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.4, bucket_col="label"
    )




# -- live MinHash/SimHash oracles (round 9) ----------------------------
# The shingle base hash is portable (operators.dedup.portable_hash64:
# the md5 head as a signed 64-bit int, identical in Spark and DuckDB
# including the sign-bit wrap), so the
# signatures themselves recompute LIVE — no frozen goldens. The
# permutation constants are the operator's own (seeded _perm_params),
# inlined as a VALUES table.

_SHINGLE_CTES = r"""
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3),
h AS (
  SELECT doc_id,
         list_transform(s, x ->
           CAST((CAST(CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) AS HUGEINT)
                  * 4294967296
                + CAST(('0x' || substr(md5(x), 9, 8)) AS BIGINT)
                - CASE WHEN CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)
                            >= 2147483648
                       THEN CAST(18446744073709551616 AS HUGEINT)
                       ELSE 0 END) AS BIGINT)) AS bs
  FROM sh)"""


def _minhash_oracle() -> str:
    from flink_framework_spark.operators.dedup import _perm_params

    perms = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(_perm_params(64))
    )
    return f"""
WITH {_SHINGLE_CTES},
e AS (SELECT doc_id,
            ((unnest(bs) % 2147483647) + 2147483647) % 2147483647 AS hp
      FROM h),
perms(i, a, b) AS (VALUES {perms}),
m AS (
  SELECT doc_id, i, MIN((a * hp + b) % 2147483647) AS mh
  FROM e CROSS JOIN perms GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mh ORDER BY i) AS sg FROM m GROUP BY 1),
bd AS (
  SELECT doc_id, bi,
         array_to_string(list_slice(sg, bi * 4 + 1, bi * 4 + 4), ',')
           AS bk
  FROM sig CROSS JOIN (SELECT unnest(range(0, 16)) AS bi) r),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bd a JOIN bd b
    ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
ver AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(x.bs, y.bs)) AS DOUBLE)
           / (len(x.bs) + len(y.bs) - len(list_intersect(x.bs, y.bs)))
           AS jaccard
  FROM cand
  JOIN h x ON x.doc_id = doc_a
  JOIN h y ON y.doc_id = doc_b)
SELECT doc_a, doc_b, jaccard FROM ver WHERE jaccard >= 0.5
"""


def _simhash_oracle() -> str:
    # all 64 bits vote; bit 63's mask is the SIGNED value -2^63 (the
    # same wrap-by-addition the Spark operator performs), keeping the
    # fingerprint arithmetic inside BIGINT in both engines
    def mask(b):
        return (1 << b) if b < 63 else -(1 << 63)

    bit_terms = "\n         + ".join(
        f"CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN {mask(b)} ELSE 0 END"
        for b in range(64)
    )
    return f"""
WITH {_SHINGLE_CTES},
e AS (SELECT doc_id, unnest(bs) AS h FROM h),
fp AS (
  SELECT doc_id,
         {bit_terms} AS f
  FROM e GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= 8
"""


@register(
    "q_dedup_minhash",
    family="K",
    # LIVE oracle (round 9): the portable md5-derived 64-bit base hash makes
    # the full MinHash pipeline — shingles, 64 seeded permutations,
    # 16-band LSH candidates, exact-Jaccard verify — recomputable in
    # DuckDB SQL verbatim (banding compares the signature SLICES
    # directly where Spark equi-joins their hash: identical pair
    # sets absent a 64-bit hash collision between band strings).
    oracle=_minhash_oracle(),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup pairs with exact-Jaccard
    verification, recomputed LIVE by the DuckDB oracle end-to-end
    (portable base hash — operators.dedup.portable_hash64);
    planted-dup precision/recall properties in tests/test_dedup.py."""
    return near_dup_pairs_minhash(
        table(spark, sf_dir, "documents"), threshold=0.5
    )


@register(
    "q_dedup_simhash",
    family="K",
    # LIVE oracle (round 9): fingerprints recomputed from the
    # portable base hash (per-bit majority votes spelled as 60
    # aggregate CASEs), then BRUTE-FORCE hamming <= 8 over all pairs
    # — sound as the expected output because the operator's default
    # n_blocks = max_hamming + 1 pigeonhole blocking is
    # recall-COMPLETE (the returned set IS exactly the pairs within
    # max_hamming; completeness pinned in tests/test_advice_fixes).
    oracle=_simhash_oracle(),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup candidates via block pigeonhole join
    + exact Hamming verify, recomputed LIVE by the DuckDB oracle
    (portable base hash + brute-force hamming, sound because the
    default blocking is recall-complete) + planted-dup properties.

    SCALE CONTRAST, not the shipped path: 16-bit block keys collide
    quadratically at deep tiles (measured alpha 1.56 at 30x —
    SCALING.md), which is exactly why the shipped method is the
    128-bit Manku combination-key spelling (``q_dedup_simhash128``,
    alpha 0.73 at 100x). Kept registered + benched as the labeled
    quadratic alternative measured to its conclusion; it is
    deliberately OUTSIDE the driver-attested ``q_dedup_suite`` melt
    so the attested slot stays sublinear at depth."""
    return simhash_near_dup_pairs(
        table(spark, sf_dir, "documents"), max_hamming=8
    )


@register(
    "q_jaccard_topk",
    family="K",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3),
kb AS (SELECT doc_id, s, list_sort(s)[1] AS mink FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS match_id,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
  FROM kb a JOIN kb b ON a.mink = b.mink AND a.doc_id <> b.doc_id)
SELECT doc_id, match_id, ROUND(jac, 4) AS jac, rn FROM (
  SELECT doc_id, match_id, jac,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY jac DESC, match_id) AS rn
  FROM pairs) t
WHERE rn <= 3
""",
)
def q_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-document retrieval: top-3 block mates per document by
    exact shingle Jaccard (min-shingle blocking = 1-permutation
    MinHash band, so the whole operator — blocking, verify, ranking —
    is live-SQL-oracle-checked; operators.dedup.jaccard_topk)."""
    return jaccard_topk(table(spark, sf_dir, "documents"), k=3)




def _simhash128_oracle() -> str:
    """128-bit SimHash fingerprints recomputed in DuckDB: word 0
    votes on the portable base hash, word 1 on its splitmix64 remix
    (Steele et al. OOPSLA'14 finalizer) — the 64-bit modular
    multiplies spelled as split 32-bit products in HUGEINT, shifts
    logical on UBIGINT; verified step-for-step against the numpy
    reference. Brute-force hamming <= 8 over both words is the exact
    expected output (combine-2 blocking keeps recall complete for
    d <= max_hamming)."""
    M = 1 << 64

    def mm(u: str, c: int) -> str:
        # (u * c) mod 2^64 without overflowing HUGEINT: split u into
        # 32-bit halves, recombine the partial products mod 2^64
        return (
            f"CAST((((CAST({u} AS HUGEINT) & 4294967295) * {c} "
            f"+ ((((CAST({u} AS HUGEINT) >> 32) * {c}) % 4294967296)"
            f" * 4294967296)) % {M}) AS UBIGINT)"
        )

    def word(col: str, name: str) -> str:
        terms = "\n           + ".join(
            f"CASE WHEN SUM(CASE WHEN ({col} >> {b}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) > 0 "
            f"THEN CAST({1 << b} AS HUGEINT) "
            f"ELSE CAST(0 AS HUGEINT) END"
            for b in range(64)
        )
        return f"CAST(({terms}) AS UBIGINT) AS {name}"

    return f"""
WITH {_SHINGLE_CTES},
e AS (SELECT doc_id, unnest(bs) AS h FROM h),
eu AS (
  SELECT doc_id,
         CAST((CAST(h AS HUGEINT)
               + CASE WHEN h < 0 THEN {M} ELSE 0 END) AS UBIGINT) AS hu
  FROM e),
s1 AS (SELECT doc_id, hu,
         CAST((CAST(hu AS HUGEINT) + 11400714819323198485) % {M}
              AS UBIGINT) AS u1 FROM eu),
s2 AS (SELECT doc_id, hu, xor(u1, u1 >> 30) AS u2 FROM s1),
s3 AS (SELECT doc_id, hu, {mm("u2", 13787848793156543929)} AS u3 FROM s2),
s4 AS (SELECT doc_id, hu, xor(u3, u3 >> 27) AS u4 FROM s3),
s5 AS (SELECT doc_id, hu, {mm("u4", 10723151780598845931)} AS u5 FROM s4),
sz AS (SELECT doc_id, hu, xor(u5, u5 >> 31) AS z FROM s5),
fp AS (
  SELECT doc_id,
         {word("hu", "w0")},
         {word("z", "w1")}
  FROM sz GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.w0, b.w0))
            + bit_count(xor(a.w1, b.w1)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 8
"""


@register(
    "q_dedup_simhash128",
    family="K",
    # LIVE oracle (round 9): see _simhash128_oracle — the whole
    # 128-bit fingerprint pipeline (portable base hash + splitmix64
    # second word) recomputes in DuckDB, brute-force hamming as the
    # recall-complete expected output.
    oracle=_simhash128_oracle(),
)
def q_dedup_simhash128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit SimHash near-dup pairs (Manku WWW'07 combination-block
    keys, combine=2): ~26-bit combination keys vs the 64-bit
    operator's 14-bit — the wide-fingerprint rung that keeps the
    birthday-process candidate growth at bay in the tight-threshold
    (hamming <= 8) near-exact-dup regime. Deterministic (xxhash64 +
    splitmix64); value-checked against a frozen golden at sf0.01 plus
    pair-for-pair brute-force equality props
    (tests/test_simhash128.py)."""
    return simhash128_near_dup_pairs(
        table(spark, sf_dir, "documents"), max_hamming=8, combine_blocks=2
    )




def _dedup_clusters_oracle() -> str:
    """Cluster manifest LIVE: the generated MinHash pair pipeline
    nested as the edge list, connected components via a recursive-CTE
    transitive closure (min-id labels — the spelling proven by the
    independent recheck), sizes and keep flags per document with
    singleton attachment."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, e.b FROM reach r JOIN und e ON r.b = e.a
  WHERE e.b <> r.a),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS cluster
  FROM reach GROUP BY a),
want AS (
  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
SELECT doc_id, cluster,
       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size,
       (doc_id = cluster) AS keep
FROM want
"""


@register(
    "q_dedup_clusters",
    family="K",
    # LIVE oracle (round 9): the portable MinHash pair pipeline as
    # the edge list + recursive-CTE components — no golden.
    oracle=_dedup_clusters_oracle(),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster manifest: MinHash-LSH pairs -> connected
    components -> canonical survivor per cluster (keep = min doc id),
    recomputed LIVE by the DuckDB oracle (portable-hash pair pipeline
    + recursive-CTE transitive closure); transitive-chain behavior is
    property-tested in tests/test_dedup.py."""
    return dedup_clusters(table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "q_dedup_edit",
    family="K",
    oracle="""
WITH keyed AS (
  SELECT c_custkey AS id, c_name AS s,
         UNNEST(list_distinct(list_prepend(c_name,
           list_transform(range(1, len(c_name) + 1),
             i -> substr(c_name, 1, i - 1)
                  || substr(c_name, i + 1, len(c_name)))))) AS k
  FROM customer)
SELECT id_a, id_b, dist FROM (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.id < b.id) t
CROSS JOIN LATERAL (SELECT levenshtein(sa, sb) AS dist) d
WHERE dist <= 1
""",
)
def q_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dedup over customer names: symmetric-delete
    (SymSpell) blocking -> equi-join on delete key -> exact
    Levenshtein verify. Guaranteed recall at distance <= 1
    (operators.dedup.edit_distance_pairs). The zero-padded fixture
    names make every single-digit substitution a planted near-dup."""
    return edit_distance_pairs(
        table(spark, sf_dir, "customer"), "c_custkey", "c_name"
    )


@register(
    "q_dedup_incremental",
    family="K",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3),
kb AS (SELECT doc_id, s, list_sort(s)[1] AS mink FROM sh),
newb AS (SELECT * FROM kb WHERE doc_id % 10 = 0),
corp AS (SELECT * FROM kb WHERE doc_id % 10 <> 0),
dup AS (
  SELECT DISTINCT n.doc_id
  FROM newb n JOIN corp c ON n.mink = c.mink
  WHERE CAST(len(list_intersect(n.s, c.s)) AS DOUBLE)
        / (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))) >= 0.5)
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 10 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM dup)
""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch incremental dedup: docs with id % 10 == 0 play the
    new crawl batch, the rest the accumulated corpus; new docs
    near-duplicating the corpus (min-shingle-blocked Jaccard >= 0.5)
    are dropped (operators.dedup.incremental_dedup_ngram)."""
    docs = table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup_ngram(new_batch, corpus).select("doc_id")


@register(
    "q_dedup_embed_cells",
    family="K",
    # LIVE oracle, blocking-aware since r11: DuckDB replays the
    # probe-cell candidate generation from the frozen EMBED_CELL_BOOKS
    # and the exact cosine verify — the operator's declared contract,
    # the same footing as the ANN top-k oracles. (The r9 brute-force
    # spelling asserted 100% multi-probe recall, which is a measured
    # per-corpus floor — true at sf0.01, 903/920 at sf0.1 — not an
    # invariant; recall vs brute force stays pinned independently in
    # tests/test_oracle_independent.py.)
    oracle_by_sf=per_sf(lambda sf: embed_cells_select_sql(sf=sf)),
)
def q_dedup_embed_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs under the DEPLOYMENT blocking
    discipline: IMI product cells sized to the corpus (``n_cells =
    max(9, N/250)``, two codebooks of ``ceil(sqrt(n_cells))``
    centroids each) instead of the fixture's fixed 10-label buckets.
    Label buckets grow with the corpus, so the label-bucketed
    spelling (``q_dedup_embed``, kept registered as the
    live-SQL-oracle fixture form) goes quadratic at depth — measured
    as the dedup melt's former 10x hotspot (embed branch alpha ~2,
    108 s at the 10x tile). Three design choices, each the repo's
    established scale pattern measured to its conclusion:

    - **cells ~ N** bounds per-cell pair work (SemDeDup sizing);
    - **IMI two-level assignment** keeps the corpus->cell step at
      O(N*sqrt(k)) where flat IVF's O(N*k), k ~ N, re-grows a
      quadratic term (the flat variant measured alpha 1.16 at the
      30x tile before this switch);
    - **top-4 multi-probe assignment** recovers boundary-straddling
      pairs (single assignment sees 37% of the brute-force >= 0.4
      pairs at sf0.01; top-4 IMI probes see 59/59 = 100% — recall floor
      pinned in tests/test_oracle_independent.py), at ~p^2/k of the
      all-pairs space.

    The pair kernel is per-cell numpy GEMM
    (operators.similarity.cell_near_dup_pairs — the vectorization
    discipline the semantic family already uses; the interpreted
    expression kernel measured 26 s at sf0.1 vs 0.9 s). Deterministic
    (seeded bounded-sample k-means + float64 assignment contract), so
    the oracle is a frozen golden at the driver's sf0.01."""
    import math

    from flink_framework_spark.functions.helpers import (
        round_duck,
        to_double_array,
    )
    from flink_framework_spark.operators.similarity import (
        _imi_probes_vec,
        cell_near_dup_pairs,
        train_imi,
    )

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()  # bounded scalar read — sizes the cell count
    k_half = max(3, math.ceil(math.sqrt(n / 250)))
    books = train_imi(emb, k_per_half=k_half)
    return cell_near_dup_pairs(
        emb,
        threshold=0.4,
        cells=_imi_probes_vec(books, 4)(to_double_array("embedding")),
    ).select(
        "vec_a", "vec_b", round_duck(F.col("cos"), 4).alias("cosim")
    )
