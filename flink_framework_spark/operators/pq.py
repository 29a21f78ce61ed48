"""Product quantization (IVF-PQ) for similarity search at scale.

The third rung of the ANN ladder (after brute force and IVF): corpus
vectors compress to ``m`` one-byte codes (nearest sub-codebook entry
per subspace — Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011, the scheme FAISS implements), and query
scoring becomes asymmetric distance computation (ADC): one lookup
table of ``m x n_codes`` query-to-code distances per query, then each
candidate costs ``m`` table lookups instead of a ``dim``-length dot
product. At 100 TB this is why the index fits in RAM: 64-dim float
vectors (256 B) become 8 B of codes.

Spark-first decomposition (mirrors ``operators.similarity``'s IVF):

- ``pq_train``      — driver-side numpy k-means per subspace on a
                      BOUNDED id-ordered sample (train_cap discipline);
                      the codebook artifact is O(m * n_codes * dsub).
- ``pq_encode``     — corpus encoding as LITERAL-codebook Catalyst
                      expressions: a pure narrow map, no join/shuffle,
                      codegen-cached across subspaces.
- ``ivfpq_topk``    — IVF coarse cells generate candidates (equi-join
                      on cell id, the scale plan), ADC scores them:
                      ``zip_with(codes, lut, (c, l) -> l[c])`` summed —
                      all JVM expressions — then an EXACT re-ranking
                      pass rescores the ADC shortlist (FAISS's
                      IndexRefine): the quantized index prunes
                      candidates -> rerank, full vectors are fetched
                      for only ``Q x rerank`` rows by an id equi-join.

Vectors are L2-normalized before PQ so squared-L2 ADC distance maps
to cosine (``cos ~= 1 - d2/2``); the REPORTED score after re-ranking
is the exact cosine of the shortlisted pair. Measured on the sandbox
embeddings fixture (near-isotropic 64-dim vectors — the hard case for
PQ): raw ADC ranking reaches only ~0.28 top-5 recall at m=8/16 codes
because per-subspace quantization error (~0.07 sq-L2/subspace)
swamps the score gaps between true neighbors; the rerank pass lifts
recall to the IVF probing ceiling (0.74-0.76 at nprobe=4) while
keeping the corpus-wide scoring pass on 8-byte codes. Everything is
deterministic (seeded init, argmin ties to the lowest code, id
tiebreaks at both ranking stages), so outputs are golden-snapshot
safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import (
    norm,
    round_duck,
    to_double_array,
)
from flink_framework_spark.operators.similarity import (
    _cell_assign,
    _cell_dists,
)

Codebooks = list[list[list[float]]]  # [subspace][code][component]


def _unit(vec: Column) -> Column:
    """L2-normalize (expression form — kept for oracle-style
    cross-checks in tests). The norm fold is loop-invariant but
    Catalyst re-evaluates it per element (O(d^2) per row,
    interpreted); the hot index-build path uses ``_unit_vec``, one
    numpy pass per Arrow batch — a production lake would store
    precomputed norms instead."""
    n = norm(vec)
    return F.transform(vec, lambda x: x / n)


def _unit_vec(col: Column) -> Column:
    """Arrow-vectorized L2 normalization (float64; zero vectors pass
    through unscaled). Same 1-ulp pairwise-vs-sequential summation
    caveat as ``pq_codes_vec`` — don't assert bit-equality with the
    expression form; rounded outputs (4 dp cosines) are unaffected.
    (The udf is built per call: pandas_udf parses its DDL return type
    against the ACTIVE session, so a module-level decorator would
    fail at import time in session-less contexts.)"""

    @F.pandas_udf("array<double>")
    def u(vs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        return pd.Series(list(X / np.where(nrm == 0.0, 1.0, nrm)))

    return u(col)


def pq_train(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_cap: int = 16384,
    max_iter: int = 8,
    seed: int = 42,
    normalize: bool = True,
) -> Codebooks:
    """Per-subspace k-means codebooks from a bounded sample of
    L2-normalized vectors. Same deterministic scheme as
    ``train_ivf_centroids`` (seeded init, argmin assignment), one
    independent quantizer per subspace (seed offset by subspace).
    ``normalize=False`` trains in the raw space — used by the IMI
    coarse quantizer (``similarity.train_imi``), which must quantize
    the same space the flat IVF cells do."""
    import numpy as np

    sample = (
        df.select(
            F.col(id_col).alias("__i"), to_double_array(vec_col).alias("__v")
        )
        # hash-spread deterministic sample — same rationale as
        # train_ivf_centroids (prefix sampling is unrepresentative on
        # tiled/partitioned corpora; identical when corpus <= cap)
        .orderBy(F.md5(F.col("__i").cast("string")), "__i")
        .limit(train_cap)
        .collect()
    )
    # position-stable init: id-sort the collected rows (see
    # train_ivf_centroids — identical X when corpus <= cap)
    sample = sorted(sample, key=lambda r: r["__i"])
    X = np.array([r["__v"] for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    if normalize:
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: Codebooks = []
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        k = min(n_codes, len(Xs))
        rng = np.random.RandomState(seed + s)
        cents = Xs[rng.choice(len(Xs), size=k, replace=False)]
        for _ in range(max_iter):
            d2 = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = Xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_codes(vec: Column, books: Codebooks) -> Column:
    """array<int> of per-subspace nearest-code ids for a NORMALIZED
    vector column — literal-codebook expressions, narrow map.

    NOTE: kept as the reference JVM-expression form (and for oracle-
    style cross-checks in tests); the hot path uses ``pq_codes_vec``
    — higher-order functions are interpreted (no whole-stage
    codegen), and at n_codes=64 the per-row lambda evaluation plus
    the 4096-literal expression tree's analysis cost dominate the
    encode pass (measured 6.5 s -> ~0.4 s at sf0.1)."""
    dsub = len(books[0][0])
    parts = []
    for s, book in enumerate(books):
        cb = [(c, comp) for c, comp in enumerate(book)]
        sub = F.slice(vec, s * dsub + 1, dsub)
        parts.append(
            F.array_min(_cell_dists(sub, cb)).getField("cell").cast("int")
        )
    return F.array(*parts)


def pq_codes_vec(books: Codebooks):
    """Arrow-vectorized twin of ``pq_codes`` (same discipline as
    ``dedup.minhash_signature_vec``): per batch, one numpy
    distance-matrix argmin per subspace. Ties go to the lowest code
    (numpy argmin), matching the struct-(d, cell) ordering of the
    expression form; all math in float64. NOTE: numpy's pairwise
    summation can differ from the expression form's sequential fold
    by 1 ulp, so on sub-ulp distance ties the two forms may pick
    different codes — each form is individually deterministic (this
    vec form is the one the goldens pin), but do not assert
    bit-equality between them."""
    mats = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = mats[0].shape[1]

    @F.pandas_udf("array<int>")
    def codes(vs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        out = np.empty((len(X), len(mats)), dtype=np.int32)
        for s, m in enumerate(mats):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            d2 = ((Xs[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return codes


def _adc_lut_vec(books: Codebooks):
    """Arrow-vectorized twin of ``_adc_lut``: the per-query
    m x n_codes squared-L2 table in one numpy pass (the expression
    form pays ~2.8 s of plan analysis for the 4096-double literal
    tree alone). Same 1-ulp pairwise-vs-sequential summation caveat
    as ``pq_codes_vec``: don't assert bit-equality across forms."""
    mats = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = mats[0].shape[1]

    @F.pandas_udf("array<array<double>>")
    def lut(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            q = np.asarray(v, dtype=np.float64)
            out.append(
                [
                    ((q[s * dsub : (s + 1) * dsub][None, :] - m) ** 2).sum(
                        axis=1
                    )
                    for s, m in enumerate(mats)
                ]
            )
        return pd.Series(out)

    return lut


def _adc_lut(qvec: Column, books: Codebooks) -> Column:
    """array<array<double>>: squared-L2 distance from each NORMALIZED
    query subvector to every code of its subspace codebook."""
    dsub = len(books[0][0])
    luts = []
    for s, book in enumerate(books):
        sub = F.slice(qvec, s * dsub + 1, dsub)
        mat = F.lit([[float(x) for x in c] for c in book])
        luts.append(
            F.transform(
                mat,
                lambda c: F.aggregate(
                    F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
    return F.array(*luts)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    books: Codebooks,
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate kNN with exact re-ranking: IVF cells
    generate candidates (equi-join on cell id), PQ/ADC scores them
    (m lookups per pair, codes only — no vectors move), the top
    ``rerank`` per query are rescored with exact cosine (full vectors
    fetched by id equi-join for Q x rerank rows only). Output
    (query_id, neighbor_id, score, rn) with score = exact cosine of
    the surviving pairs, ranked desc with id tiebreak.

    Scale shape: the corpus-wide pass touches (cell:int, codes:
    m bytes) — at 100 TB of 64-dim vectors that is a 32x smaller
    shuffle than IVF with raw vectors; the rerank joins are
    broadcast-sized (Q x rerank and Q rows)."""
    from pyspark.sql import Window

    from flink_framework_spark.operators.dedup import _staged

    from flink_framework_spark.functions.helpers import dot

    # Stage the normalized vector BEFORE slicing into subspaces:
    # pq_codes/_adc_lut reference it m times, and CollapseProject
    # would otherwise inline the norm fold into every per-element
    # lambda (the SCALING.md expression-duplication hazard). The
    # staged frame is the PQ index itself — the artifact a production
    # deployment materializes offline anyway — and the rerank pass
    # re-reads it for the shortlisted ids.
    enc_nv = _staged(
        _cell_assign(corpus, centroids, vec_col, "__cell").select(
            F.col(id_col).alias("neighbor_id"),
            "__cell",
            _unit_vec(to_double_array(vec_col)).alias("__nv"),
        )
    )
    enc = enc_nv.select(
        "neighbor_id",
        "__cell",
        pq_codes_vec(books)(F.col("__nv")).alias("__codes"),
    )
    # One staged row per query holding both the raw vector (cell
    # probing runs in the coarse quantizer's raw space, same as
    # corpus assignment) and the unit vector (PQ/ADC + exact rerank
    # run in cosine space).
    q_nv = _staged(
        queries.select(
            F.col(id_col).alias("query_id"),
            to_double_array(vec_col).alias("__qv"),
        ).withColumn("__nqv", _unit_vec(F.col("__qv")))
    )
    # Compute the per-query ADC table BEFORE the probe explode: the
    # UDF then runs once per query, not once per (query, probe) —
    # nprobe x less numpy work and Arrow transfer.
    probes = (
        q_nv.withColumn("__lut", _adc_lut_vec(books)(F.col("__nqv")))
        .withColumn(
            "__probe",
            F.explode(
                F.slice(
                    F.array_sort(_cell_dists(F.col("__qv"), centroids)),
                    1,
                    nprobe,
                )
            ),
        )
        .select(
            "query_id",
            F.col("__probe.cell").alias("__cell"),
            "__lut",
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__codes"),
            F.col("__lut"),
            lambda c, l: F.element_at(l, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # Candidate scoring: codes-only equi-join on cell id — the pass
    # that sees the whole corpus moves m bytes/vector, not the vector.
    pairs = probes.join(enc, "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("__adc"), F.col("neighbor_id")
    )
    shortlist = (
        pairs.withColumn("__adc", F.lit(1.0) - d2 / F.lit(2.0))
        .withColumn("__arn", F.row_number().over(w_adc))
        .filter(F.col("__arn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # Exact re-ranking (FAISS IndexRefine): fetch full vectors for
    # the Q x rerank survivors only. Both joins broadcast the tiny
    # side; the corpus-side probe is an id lookup.
    sl = shortlist.join(
        F.broadcast(q_nv.select("query_id", "__nqv")), "query_id"
    )
    rescored = enc_nv.select("neighbor_id", "__nv").join(
        F.broadcast(sl), "neighbor_id"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__score"), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("__score", dot(F.col("__nqv"), F.col("__nv")))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            round_duck("__score", 4).alias("score"),
            "rn",
        )
    )
