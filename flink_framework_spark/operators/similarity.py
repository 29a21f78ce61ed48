"""Similarity search over embedding columns (SURVEY.md §2 K3).

Two paths, same per-pair kernel (``functions.helpers.cosine_sim``, a
JVM higher-order-function fold in double precision):

- ``brute_force_topk``: exact top-k by scoring every (query, corpus)
  pair. The small query side is broadcast, so the plan is a broadcast
  nested-loop with no shuffle of the corpus — correct baseline, O(Q·N).
- ``bucketed_topk``: the scale path — restrict candidates to a
  precomputed coarse bucket (IVF-style cell id: here any integer
  column, e.g. a k-means cluster id computed offline; the fixtures'
  ``label`` column plays that role). Candidate generation becomes an
  equi-join on the bucket id — shuffle-partitioned, skew-handled by
  AQE — and scoring cost drops by the bucket fan-out factor. At 100 TB
  this is the difference between an impossible cross join and a
  bounded per-cell scan; recall depends on bucket quality, which is
  why the exact path stays as the verification baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import (
    dot,
    norm,
    round_duck,
    to_double_array,
)


def _score_and_rank(
    pairs: DataFrame, k: int, query_id: str, neighbor_id: str
) -> DataFrame:
    # norms were computed once per VECTOR before the pair join (__qn /
    # __cn) — only the dot product is per-pair work. Same expression
    # shape per value as cosine_sim, so scores stay bit-identical to
    # the DuckDB oracle; the per-pair fold cost drops 3x.
    cos = dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    w = Window.partitionBy(query_id).orderBy(F.desc("__cos"), F.col(neighbor_id))
    return (
        pairs.withColumn("__cos", cos)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            query_id,
            neighbor_id,
            round_duck("__cos", 4).alias("cosim"),
            "rn",
        )
    )


def _prep(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str,
          extra: list[str] | None = None) -> DataFrame:
    cols = [F.col(id_col).alias(out_id), to_double_array(vec_col).alias(out_vec)]
    cols += [F.col(c) for c in (extra or [])]
    out_norm = "__qn" if out_vec == "__qv" else "__cn"
    return df.select(*cols).withColumn(out_norm, norm(F.col(out_vec)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set over the
    corpus. Output: query_id, neighbor_id, cosim (rounded 4), rn."""
    q = _prep(queries, id_col, vec_col, "query_id", "__qv")
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "__cv")
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(pairs, k, "query_id", "neighbor_id")


def bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k searching only the query's coarse bucket
    (IVF cell / LSH bucket). Equi-join on the bucket id keeps the
    candidate set per query bounded."""
    q = _prep(queries, id_col, vec_col, "query_id", "__qv", [bucket_col]).withColumnRenamed(
        bucket_col, "__qb"
    )
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "__cv", [bucket_col]).withColumnRenamed(
        bucket_col, "__cb"
    )
    pairs = q.join(
        c,
        (F.col("__qb") == F.col("__cb"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    return _score_and_rank(pairs, k, "query_id", "neighbor_id")


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets.

    Same candidate-pruning discipline as ``bucketed_topk``: the
    equi-join on the bucket id bounds the pair space; the cosine
    kernel verifies. Output: vec_a < vec_b with cosine >= threshold.
    """
    from flink_framework_spark.operators.dedup import _staged

    # _staged: the bucket self-join consumes the normed vectors in
    # both branches — persist so the cast + norm pass runs once
    e = _staged(
        df.select(
            F.col(id_col).alias("__eid"),
            to_double_array(vec_col).alias("__v"),
            F.col(bucket_col).alias("__bk"),
        ).withColumn("__n", norm(F.col("__v")))
    )
    a = e.select(
        F.col("__eid").alias("vec_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"), "__bk",
    )
    b = e.select(
        F.col("__eid").alias("vec_b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"), "__bk",
    )
    # per-vector norms precomputed above; only the dot is per-pair
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        a.join(b, ["__bk"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select("vec_a", "vec_b", round_duck("__cos", 4).alias("cosim"))
    )


def gemm_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_cap: int = 4096,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k via blocked GEMM — SURVEY.md §4.3.2's
    "block-matrix pandas_udf" scale path for K3, the distributed form
    of brute force: the bounded query set ships as a numpy matrix
    inside a ``mapInPandas`` closure, each corpus Arrow batch scores
    ALL queries with one float64 matrix multiply (BLAS, ~dim times
    fewer interpreter dispatches than per-pair folds), keeps its
    per-query top-k candidates, and a global window merges the
    <= k * n_batches survivors. Exact by the same argument as
    TakeOrderedAndProject: per-batch selection uses the same total
    order (score desc, neighbor id asc) as the global rank, so no
    globally-selected row can be pruned locally.

    Scale shape: ONE narrow pass over the corpus (no shuffle of
    vectors), candidate shuffle is k rows per query per batch. For
    query sets beyond ``query_cap`` (driver-artifact bound), tile the
    query side and union — each tile is this same plan.

    Determinism note: numpy's GEMM uses pairwise/FMA summation, so a
    score can differ from the sequential-fold cosine by ~1e-14; ranks
    flip only if two true cosines are closer than that, and the
    output rounds to 4 dp like every cosine in this repo. Output:
    (query_id, neighbor_id, cosim, rn) — same contract as
    ``brute_force_topk``, which remains the bit-exact oracle form.

    ``exclude_label_col``: hard-negative mining mode (contrastive-
    training data pipelines): candidates sharing the query's label are
    masked out before per-batch selection, so the top-k are the
    nearest WRONG-class vectors. Same exactness argument — the mask is
    a per-pair predicate applied before an order-preserving selection.
    NULL labels follow SQL ``<>`` semantics (the oracle spelling): a
    pair with a NULL label on EITHER side never matches, so
    unknown-label vectors are neither served as negatives nor given
    negatives.
    """
    qcols = [F.col(id_col), to_double_array(vec_col).alias("__v")]
    if exclude_label_col is not None:
        qcols.append(F.col(exclude_label_col).alias("__l"))
    qrows = (
        queries.select(*qcols)
        .orderBy(id_col)
        .limit(query_cap + 1)
        .collect()
    )
    if len(qrows) > query_cap:
        raise ValueError(
            f"gemm_topk query side exceeds query_cap={query_cap}; "
            "tile the query set and union the results"
        )
    if not qrows:
        raise ValueError("gemm_topk needs a non-empty query set")
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Qm = np.array([r["__v"] for r in qrows], dtype=np.float64)
    Qt = (Qm / np.linalg.norm(Qm, axis=1, keepdims=True)).T  # (dim, q)
    qlabs = (
        np.array([r["__l"] for r in qrows], dtype=object)
        if exclude_label_col is not None
        else None
    )
    # pd.isna on BOTH sides: SQL NULL arrives as None on the driver
    # side but as NaN in pandas float columns; one predicate keeps
    # the two sides symmetric (float NaN labels are treated as NULL —
    # pandas cannot distinguish them from SQL NULL, so the documented
    # semantics treat both as "unknown label, never matches")
    qnull = (
        np.array([pd.isna(l) for l in qlabs])
        if qlabs is not None
        else None
    )

    def scorer(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = Xn @ Qt  # (batch, q)
            # self-pairs never compete
            S[ids[:, None] == qids[None, :]] = -np.inf
            if qlabs is not None:
                blabs = pdf[exclude_label_col].to_numpy(dtype=object)
                bnull = np.array([pd.isna(l) for l in blabs])
                S[
                    (blabs[:, None] == qlabs[None, :])
                    | bnull[:, None]
                    | qnull[None, :]
                ] = -np.inf
            kk = min(k, len(ids))
            out_q, out_n, out_s = [], [], []
            for j in range(S.shape[1]):
                col = S[:, j]
                if len(col) > 4 * kk:
                    pre = np.argpartition(-col, 4 * kk - 1)[: 4 * kk]
                else:
                    pre = np.arange(len(col))
                # exact per-batch order: score desc, neighbor id asc —
                # the global merge's own order, so pruning is safe
                # even on score ties
                order = pre[np.lexsort((ids[pre], -col[pre]))][:kk]
                keep = order[np.isfinite(col[order])]
                out_q.append(np.full(len(keep), qids[j]))
                out_n.append(ids[keep])
                out_s.append(col[keep])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "__score": np.concatenate(out_s),
                }
            )

    cand = corpus.mapInPandas(
        scorer, "query_id long, neighbor_id long, __score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__score"), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            round_duck("__score", 4).alias("cosim"),
            "rn",
        )
    )


def semantic_dedup(
    df: DataFrame,
    centroids,
    eps: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", 2023): cluster embeddings into coarse cells, then
    prune within-cell epsilon-balls — documents whose embeddings are
    near-identical in meaning, not just in surface text, which MinHash
    and SimHash cannot see.

    Deterministic keep rule (partition-order-free): a vector is
    DROPPED iff a lower-id vector exists in the same cell with cosine
    >= eps; ``dup_of`` records the smallest such witness (an
    explanation pointer, not necessarily the cluster representative —
    the paper keeps the member farthest from the centroid instead,
    which is equally valid but depends on a per-group argmin; the
    lowest-id rule makes the output reproducible bit-for-bit and is
    the same convention as this repo's other dedup families).

    Scale shape — identical to the paper's own implementation at
    LAION scale: cell assignment is a narrow literal-centroid map (no
    shuffle), within-cell pairing is an EQUI-join on the cell id with
    O(sum c_i^2) verify work, so the operator never sees a cross
    join; choose ``n_cells ~ N / target_cell_size`` when training the
    centroids so per-cell cost stays bounded as the corpus grows, and
    AQE's skew-join split handles hot cells. Output:
    (vec_id, cell, kept 0/1, dup_of nullable) — one row per input
    vector.
    """
    from flink_framework_spark.operators.dedup import _staged

    # Both stages run Arrow-vectorized: with n_cells growing ~N (the
    # sizing discipline above), assignment is O(N*k*dim) and pruning
    # O(sum c_i^2 * dim) — as interpreted per-element expressions
    # those dominated the 30x-tile sweep (~180 s measured); as numpy
    # GEMM they are a few Gflop. The per-cell kernel materializes a
    # c_i x c_i score block, so cell size is the memory bound —
    # exactly what the n_cells sizing discipline controls.
    assigned = df.select(
        F.col(id_col).alias("vec_id"), to_double_array(vec_col).alias("__v")
    ).withColumn("cell", _cell_assign_vec(centroids)(F.col("__v")))
    return _semantic_prune(assigned, eps)


def _semantic_prune(assigned: DataFrame, eps: float) -> DataFrame:
    """The epsilon-ball pruning stage of SemDeDup, shared by every
    coarse-quantizer front end (flat IVF cells, IMI product cells):
    ``assigned`` is (vec_id, __v, cell); the kernel and keep rule are
    exactly ``semantic_dedup``'s documented ones, so the independent
    DuckDB recheck (soundness + completeness of drops given cells)
    applies to any assignment."""
    eps_f = float(eps)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.where(nrm == 0.0, 1.0, nrm)
        S = Xn @ Xn.T
        # strict upper triangle: witness ROWS i come before column j
        # in id order (ids sorted above), so M[i, j] marks a lower-id
        # witness and dup_of = ids[first True] is the SMALLEST one
        M = (S >= eps_f) & np.triu(np.ones(S.shape, dtype=bool), k=1)
        has = M.any(axis=0)
        first = M.argmax(axis=0)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "kept": (~has).astype("int32"),
                "dup_of": pd.array(
                    [ids[first[j]] if has[j] else None for j in range(len(ids))],
                    dtype="Int64",
                ),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        prune, "vec_id long, cell int, kept int, dup_of long"
    )


def train_imi(
    df: DataFrame,
    k_per_half: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 8,
    train_cap: int = 16384,
):
    """Two-level product coarse quantizer — the inverted multi-index
    (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012):
    independent k-means codebooks on the two vector HALVES; a cell is
    the PAIR of half-codes, so ``k_per_half`` centroids per half span
    ``k_per_half^2`` cells while assignment scores only
    ``2 * k_per_half`` half-distances per vector.

    This is the at-scale fix for flat IVF's assignment term
    (SCALING.md "SemDeDup at scale"): under the ``n_cells ~ N /
    target_cell_size`` sizing discipline flat assignment is O(N*k)
    with k ∝ N — quadratic overall — while IMI assignment is
    O(N*sqrt(k)), restoring near-linear total cost. Same training
    discipline as every quantizer here: bounded hash-spread sample,
    seeded init, deterministic argmin (delegates to ``pq_train`` with
    m=2 in the RAW space, matching flat IVF cells).
    """
    from flink_framework_spark.operators.pq import pq_train

    try:
        return pq_train(
            df,
            m=2,
            n_codes=k_per_half,
            vec_col=vec_col,
            id_col=id_col,
            train_cap=train_cap,
            max_iter=max_iter,
            seed=seed,
            normalize=False,
        )
    except ValueError as e:
        if "not divisible by m=2" in str(e):
            # pq_train's generic m-divisibility check, reworded for
            # the IMI caller (no extra Spark job: the dim is only
            # known once pq_train has sampled the training set)
            raise ValueError(
                f"train_imi: {e} — IMI splits the vector into two "
                "equal halves; pad the embedding to even dimension "
                "(or use flat IVF) for odd-dim corpora."
            ) from e
        raise


def imi_assign_vec(books):
    """Arrow-vectorized IMI cell assignment: per batch, one chunked
    numpy distance-matrix argmin per HALF (ties to the lowest code,
    float64 — the same determinism contract as ``_cell_assign_vec``);
    cell id = code0 * len(books[1]) + code1."""
    mats = [np.asarray(b, dtype=np.float64) for b in books]
    assert len(mats) == 2, "IMI uses exactly two half-codebooks"
    dsub = mats[0].shape[1]
    k1 = len(mats[1])

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        c0 = _pairwise_d2(X[:, :dsub], mats[0]).argmin(axis=1)
        c1 = _pairwise_d2(X[:, dsub:], mats[1]).argmin(axis=1)
        return pd.Series((c0 * k1 + c1).astype(np.int32))

    return assign


def semantic_dedup_imi(
    df: DataFrame,
    books,
    eps: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with IMI product cells instead of flat IVF cells —
    identical pruning kernel, keep rule, and output contract as
    ``semantic_dedup`` (the independent DuckDB recheck of drops-given-
    cells applies unchanged); only the coarse quantizer differs, and
    with it the assignment cost: O(N*sqrt(n_cells)) instead of
    O(N*n_cells), which is what survives the ``n_cells ∝ N`` sizing
    discipline at growing corpus size."""
    assigned = df.select(
        F.col(id_col).alias("vec_id"), to_double_array(vec_col).alias("__v")
    ).withColumn("cell", imi_assign_vec(books)(F.col("__v")))
    return _semantic_prune(assigned, eps)


def _pairwise_d2(X, C, row_chunk: int = 2048):
    """Squared-L2 distance matrix (n, k) via the explicit-difference
    broadcast, evaluated in row chunks. The one-shot broadcast
    materializes an (n, k, dim) float64 temp — 15 GB at
    n=16384, k=240 — which turned the k-means training loop into an
    allocator benchmark (measured 50 s of a 65 s query at the 30x
    tile). Chunking bounds the temp at row_chunk*k*dim while keeping
    the arithmetic ELEMENTWISE IDENTICAL to the unchunked form (same
    per-element ops, same axis-2 summation order), so assignments —
    and therefore every centroid trajectory and frozen golden — are
    bit-stable. The GEMM identity |x|^2+|c|^2-2x.c would be faster
    still but changes the floating-point result; training is not the
    bottleneck once the temp fits in cache."""
    out = np.empty((len(X), len(C)), dtype=np.float64)
    for s in range(0, len(X), row_chunk):
        e = min(s + row_chunk, len(X))
        out[s:e] = ((X[s:e, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return out


def semantic_dedup_incremental(
    new: DataFrame,
    corpus: DataFrame,
    centroids,
    eps: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-batch SemDeDup — the rolling-crawl shape (same contract
    as ``dedup.incremental_dedup_ngram``): drop NEW vectors that are
    semantic near-dups of the accumulated CORPUS, comparing only
    new-vs-corpus within each coarse cell — never corpus x corpus,
    and intra-batch dups among the new vectors are ``semantic_dedup``'s
    job. Ids must be disjoint between the two frames (a lake invariant
    for append batches).

    Per cell the kernel is one (corpus_c x new_c) float64 GEMM, so
    each round of a rolling ingest costs |new| x cell-occupancy work.
    Output: one row per input vector from BOTH frames —
    (vec_id, cell, is_new, kept, dup_of) — corpus rows always kept;
    a new row is dropped iff a corpus vector in its cell has cosine
    >= eps, with ``dup_of`` the smallest such witness. Emitting the
    corpus rows too makes the decision INDEPENDENTLY CHECKABLE from
    raw embeddings given the output's cell column (the DuckDB
    recheck in tests/test_oracle_independent.py verifies soundness
    and completeness of every drop)."""
    tagged = new.select(
        F.col(id_col).alias("vec_id"), to_double_array(vec_col).alias("__v")
    ).withColumn("is_new", F.lit(1)).unionByName(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            to_double_array(vec_col).alias("__v"),
        ).withColumn("is_new", F.lit(0))
    )
    assigned = tagged.withColumn(
        "cell", _cell_assign_vec(centroids)(F.col("__v"))
    )
    eps_f = float(eps)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = X / np.where(nrm == 0.0, 1.0, nrm)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        isn = pdf["is_new"].to_numpy(dtype=np.int64)
        cmask, nmask = isn == 0, isn == 1
        kept = np.ones(len(ids), dtype=np.int32)
        dup = np.full(len(ids), -1, dtype=np.int64)
        if cmask.any() and nmask.any():
            S = Xn[cmask] @ Xn[nmask].T  # (corpus_c, new_c)
            M = S >= eps_f
            has = M.any(axis=0)
            # corpus rows are id-sorted, so argmax = smallest witness
            first = M.argmax(axis=0)
            cids = ids[cmask]
            new_idx = np.flatnonzero(nmask)
            kept[new_idx[has]] = 0
            dup[new_idx[has]] = cids[first[has]]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "is_new": isn.astype("int32"),
                "kept": kept,
                "dup_of": pd.array(
                    [int(d) if d >= 0 else None for d in dup], dtype="Int64"
                ),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        prune, "vec_id long, cell int, is_new int, kept int, dup_of long"
    )


def _argmin_cells(vs: pd.Series, centroids):
    """Shared numpy core of the vectorized assignment kernels: one
    distance-matrix argmin per Arrow batch, float64, ties to the
    lowest cell id — matching the (d, cell) struct-min of the
    expression form up to the documented 1-ulp pairwise-vs-sequential
    summation caveat. Returns (cell_ids[n], d2[n]) or (None, None)
    for an empty batch. ONE place owns the tie/NaN discipline so the
    cell-only and cell+distance kernels cannot drift apart."""
    mat = np.array([c for _, c in centroids], dtype=np.float64)
    cell_ids = np.array([int(i) for i, _ in centroids], dtype=np.int32)
    X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
    if len(X) == 0:
        return None, None
    d2 = _pairwise_d2(X, mat)
    best = d2.argmin(axis=1)
    return cell_ids[best], d2[np.arange(len(X)), best]


def _seq_d2(X, C, row_chunk: int = 2048):
    """Squared-L2 distance matrix (n, k) with the EXACT summation
    order of the ``_cell_dists`` expression form: per element,
    ``((0.0 + t_0) + t_1) + ...`` over dimensions in order, each
    ``t_j = (x_j - c_j) * (x_j - c_j)`` — one IEEE float64 add per
    step from a 0.0 accumulator, exactly the fold-left of
    ``aggregate(zip_with(v, c, (a,b) -> (a-b)*(a-b)), 0.0, acc+x)``
    (0.0 + t_0 is bit-exact because squared diffs are never -0.0).
    Unlike :func:`_pairwise_d2` (numpy pairwise summation, the
    documented 1-ulp caveat), results here are BIT-IDENTICAL to the
    interpreted expression, so the frozen goldens and live oracles
    that pin the expression form hold unchanged. Row chunks bound the
    (chunk, k) temp; the per-dim loop never materializes (n, k, dim).
    """
    n, k = len(X), len(C)
    out = np.empty((n, k), dtype=np.float64)
    dim = X.shape[1] if n else 0
    for s in range(0, n, row_chunk):
        e = min(s + row_chunk, n)
        acc = np.zeros((e - s, k), dtype=np.float64)
        for j in range(dim):
            diff = X[s:e, j, None] - C[None, :, j]
            acc += diff * diff
        out[s:e] = acc
    return out


def _argmin_cells_seq(vs: pd.Series, centroids):
    """Like :func:`_argmin_cells` but on :func:`_seq_d2` distances and
    with the expression form's exact tie/NaN discipline: centroids are
    ordered by cell id so first-argmin == the (d, cell) struct-min's
    lowest-id tiebreak, and NaN distances sort last (Spark's NaN
    ordering — a row mixing inf and NaN picks the inf), an all-NaN row
    picking the lowest id with d = NaN. NULL vectors (ADVICE r11) take
    the lowest cell id with d = NaN, mirroring the expression form's
    null-sorts-first array_min behaviour instead of crashing."""
    order = sorted(range(len(centroids)), key=lambda i: int(centroids[i][0]))
    mat = np.array(
        [centroids[i][1] for i in order], dtype=np.float64
    )
    cell_ids = np.array(
        [int(centroids[i][0]) for i in order], dtype=np.int32
    )
    vals = vs.tolist()
    n = len(vals)
    if n == 0:
        return None, None
    mask = np.array([v is not None for v in vals])
    lowest = np.int32(cell_ids[0]) if len(cell_ids) else np.int32(-1)
    cells = np.full(n, lowest, dtype=np.int32)
    d_out = np.full(n, np.nan, dtype=np.float64)
    X = np.array([np.asarray(v, dtype=np.float64) for v, m in zip(vals, mask) if m])
    if len(X) and len(cell_ids):
        d2 = _seq_d2(X, mat)
        isn = np.isnan(d2)
        cand = np.where(isn, np.inf, d2)
        m = cand.min(axis=1, keepdims=True)
        is_min = cand == m
        # struct-min ordering: non-NaN beats NaN at equal masked value
        # (inf < NaN), then lowest index (== lowest cell id)
        pref = is_min & ~isn
        best = np.where(
            pref.any(axis=1), pref.argmax(axis=1), is_min.argmax(axis=1)
        )
        cells[mask] = cell_ids[best]
        d_out[mask] = d2[np.arange(len(X)), best]
    return cells, d_out


def _cell_assign_vec_seq(centroids):
    """Arrow-vectorized, BIT-IDENTICAL replacement for the
    ``array_min(_cell_dists(...))`` expression form (see
    :func:`_seq_d2`): the interpreted higher-order functions cost
    ~1 µs per (row, cell, dim) element — measured ~1 s per k-means
    round at n=2000, k=8, dim=64 — where this kernel is memory-bound
    numpy. Returns ``struct<cell int, d double>``."""

    @F.pandas_udf("cell int, d double")
    def assign(vs: pd.Series) -> pd.DataFrame:
        cells, d2 = _argmin_cells_seq(vs, centroids)
        if cells is None:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "d": pd.Series([], dtype="float64")})
        return pd.DataFrame({"cell": cells, "d": d2})

    return assign


def _cell_assign_vec(centroids):
    """Arrow-vectorized twin of ``_cell_assign`` (same discipline as
    ``pq.pq_codes_vec``) — see :func:`_argmin_cells` for the kernel."""

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        cells, _d2 = _argmin_cells(vs, centroids)
        if cells is None:
            return pd.Series([], dtype="int32")
        return pd.Series(cells)

    return assign


def _cell_assign_vec_d(centroids):
    """Like :func:`_cell_assign_vec` but returning the assignment AND
    its squared distance (``struct<cell int, d double>``) — the shape
    ``kmeans_lloyd``'s final pass needs."""

    @F.pandas_udf("cell int, d double")
    def assign(vs: pd.Series) -> pd.DataFrame:
        cells, d2 = _argmin_cells(vs, centroids)
        if cells is None:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "d": pd.Series([], dtype="float64")})
        return pd.DataFrame({"cell": cells, "d": d2})

    return assign


def cell_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    cells,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS under the celled deployment
    discipline, with the pair kernel as per-cell numpy GEMM (the same
    vectorization that took semantic_dedup's 30x sweep from ~180 s of
    interpreted per-element expressions to a few Gflop): ``cells`` is
    an array column / Column of probe cell ids per vector (multi-
    assignment — see ``_imi_probes_vec``), each cell's block computes
    one normalized X·Xᵀ, and pairs found in several shared cells
    collapse deterministically at the end (``max(cos)`` per pair —
    the same quantity up to float summation order across per-cell
    GEMM blocks, so the surviving value is order-independent where
    ``dropDuplicates`` would keep an arbitrary block's copy). Cell
    size is the memory/compute bound,
    controlled by the ``n_cells ~ N / target`` sizing; AQE's
    skew-join split handles hot cells. Output: (vec_a < vec_b, cos)
    with cos UNROUNDED — callers round for oracle comparison.

    ``cell_cap`` (r11, VERDICT r10 #4) guards the degenerate corpus
    the sizing rule cannot: if billions of near-identical vectors
    land in ONE cell, that cell's pandas group is an m^2 GEMM no
    executor survives. Cells above the cap are salted into
    ``ceil(m / cap)`` deterministic sub-groups (xxhash64 of the id),
    the GEMM runs per sub-group, and a chain of BRIDGE pairs
    (consecutive sub-group min-id representatives, exact JVM cosine)
    keeps the cell one connected component. Same recall contract as
    ``dedup._capped_band_pairs``: within-cell pairwise recall drops
    to within-group + bridges, cluster connectivity survives when
    the cell's members are mutually near-dup (the only shape that
    makes a super-cell). Cells at or under the cap are untouched —
    the measured max cell size on the test corpora is far below the
    default, so the live oracles stay exact."""
    if cell_cap is not None and cell_cap < 2:
        raise ValueError(f"cell_cap must be >= 2, got {cell_cap}")
    from flink_framework_spark.operators.dedup import _staged

    assigned = df.select(
        F.col(id_col).alias("vec_id"),
        to_double_array(vec_col).alias("__v"),
        F.explode(cells).alias("__cell"),
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
        )[order]
        if len(ids) < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cos": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cos": "float64"})
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0.0] = np.nan  # zero vectors pair with nothing
        S = (X @ X.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), 1)
        vals = S[iu]
        m = vals >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[iu[0][m]],
                "vec_b": ids[iu[1][m]],
                "cos": vals[m],
            }
        )

    # r12 guard restructure (VERDICT r11 #2 — the guard must be FREE
    # when cold): with no cap, the unguarded r10 plan verbatim — one
    # pass, no persist (the GEMM groupBy is the frame's only consumer)
    if cell_cap is None:
        return (
            assigned.groupBy("__cell")
            .applyInPandas(pairs, "vec_a long, vec_b long, cos double")
            .groupBy("vec_a", "vec_b")
            .agg(F.max("cos").alias("cos"))
        )
    # with a cap, probe the TINY cell-size aggregate (cell-cardinality
    # rows, partial-aggregated — not a salted copy of the full frame as
    # in r11, which taxed every healthy corpus with a sizes join + a
    # wider persist). The staged frame is shared by the probe and the
    # GEMM pass (the probe's action warms the cache); the cold path —
    # every real corpus measured — is the unguarded plan over it.
    assigned = _staged(assigned)
    sizes = assigned.groupBy("__cell").agg(F.count("*").alias("__csz"))
    if sizes.filter(F.col("__csz") > cell_cap).isEmpty():
        return (
            assigned.groupBy("__cell")
            .applyInPandas(pairs, "vec_a long, vec_b long, cos double")
            .groupBy("vec_a", "vec_b")
            .agg(F.max("cos").alias("cos"))
        )
    # hot path: salt EVERY row uniformly (cold cells get exactly one
    # sub-group — pmod(xxhash64, 1) == 0 — so their GEMM groups are
    # the unguarded per-cell groups); sizes aggregates to cell
    # cardinality, so AQE broadcasts the salting join's small side.
    assigned = _staged(
        assigned.join(sizes, "__cell").select(
            "vec_id",
            "__v",
            "__cell",
            F.pmod(
                F.xxhash64("vec_id"),
                F.ceil(F.col("__csz") / F.lit(cell_cap)).cast("long"),
            ).alias("__salt"),
            (F.col("__csz") > cell_cap).alias("__hot"),
        )
    )
    # pass only the columns the kernel reads (guide §4: opaque
    # functions defeat column pruning, so prune explicitly)
    within = (
        assigned.select("vec_id", "__v", "__cell", "__salt")
        .groupBy("__cell", "__salt")
        .applyInPandas(pairs, "vec_a long, vec_b long, cos double")
    )
    # bridge chain for capped cells: consecutive sub-group reps,
    # exact cosine via the JVM kernel (same quantity as the GEMM up
    # to float summation order — the max(cos) collapse below already
    # absorbs per-block order variance), thresholded like any pair
    reps = (
        assigned.filter(F.col("__hot"))
        .groupBy("__cell", "__salt")
        .agg(F.min("vec_id").alias("__rep"))
    )
    w = Window.partitionBy("__cell").orderBy("__salt")
    chained = reps.select(
        "__cell", "__salt", "__rep", F.row_number().over(w).alias("__rn")
    )
    rv = assigned.select("vec_id", "__v").dropDuplicates(["vec_id"])
    bpairs = (
        chained.select("__cell", F.col("__rep").alias("__pa"), "__rn")
        .join(
            chained.select(
                "__cell",
                F.col("__rep").alias("__pb"),
                (F.col("__rn") - 1).alias("__rn"),
            ),
            ["__cell", "__rn"],
        )
        .select(
            F.least("__pa", "__pb").alias("vec_a"),
            F.greatest("__pa", "__pb").alias("vec_b"),
        )
        .join(rv.select(F.col("vec_id").alias("vec_a"),
                        F.col("__v").alias("__va")), "vec_a")
        .join(rv.select(F.col("vec_id").alias("vec_b"),
                        F.col("__v").alias("__vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("__va"), F.col("__vb"))
             / (norm(F.col("__va")) * norm(F.col("__vb")))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return (
        within.unionByName(bpairs)
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cos").alias("cos"))
    )


def _imi_probes_vec(books, nprobe: int):
    """Per-query nprobe nearest IMI product cells: k1 + k2 half-
    distances per query, then the nprobe smallest cross-sums
    (d0[c0] + d1[c1] IS the squared-L2 distance to the product
    centroid concat(m0[c0], m1[c1])). Ties break to the lowest cell
    id (row-major c0*k2+c1), matching the flat path's argmin
    convention."""
    mats = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = mats[0].shape[1]
    k2 = len(mats[1])

    @F.pandas_udf("array<int>")
    def probes(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            q = np.asarray(v, dtype=np.float64)
            d0 = ((q[None, :dsub] - mats[0]) ** 2).sum(axis=1)
            d1 = ((q[None, dsub:] - mats[1]) ** 2).sum(axis=1)
            s = (d0[:, None] + d1[None, :]).ravel()
            ids = np.arange(len(s))
            order = np.lexsort((ids, s))[:nprobe]
            out.append(ids[order].astype(np.int32))
        return pd.Series(out)

    return probes


def imi_topk(
    queries: DataFrame,
    corpus: DataFrame,
    books,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF kNN over IMI product cells — the ANN rung that survives the
    ``n_cells ∝ N`` deployment discipline: flat-IVF corpus assignment
    is O(N*k*dim) with k ∝ N (measured superlinear, alpha ~1.1 at the
    100x tile even Arrow-vectorized), while the IMI quantizer scores
    2*sqrt(k) half-distances per vector and the query side probes
    product cells from one k1 x k2 cross-sum. Candidate generation
    stays an equi-join on the cell id; scoring is the exact cosine
    kernel; output contract identical to ``ivf_topk``
    (query_id, neighbor_id, cosim, rn). Recall depends on cell
    quality exactly as flat IVF's does and is property-tested against
    brute force."""
    k2 = len(books[1])
    corpus_cells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("__cv"),
    ).withColumn("__cell", imi_assign_vec(books)(F.col("__cv")))

    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            to_double_array(vec_col).alias("__qv"),
        )
        .withColumn("__qn", norm(F.col("__qv")))
        .withColumn(
            "__cell",
            F.explode(_imi_probes_vec(books, nprobe)(F.col("__qv"))),
        )
    )
    cands = probes.join(
        corpus_cells.withColumn("__cn", norm(F.col("__cv"))), "__cell"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(cands, k, "query_id", "neighbor_id")


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    id_col: str = "vec_id",
    train_cap: int = 16384,
):
    """Train IVF coarse cells: seeded Lloyd's k-means on a BOUNDED
    deterministic sample, driver-side in numpy.

    This is the scale-correct shape (it is what FAISS does): an IVF
    coarse quantizer needs only a fixed-size training sample — O(100)
    vectors per cell — no matter how large the corpus is, so training
    cost is a constant ``train_cap`` collect + a few vectorized numpy
    passes, independent of corpus size. The distributed part of IVF is
    cell ASSIGNMENT (a narrow map over the corpus, `_cell_assign`),
    not quantizer training. Replacing the previous MLlib KMeans (8
    distributed jobs for a task this small) cut ~2.5s/query at sf0.1.

    Returns a small driver-side list of (cell_id, centroid) — the
    offline artifact a production deployment would persist alongside
    the lake and broadcast to queries.
    """
    sample = (
        df.select(F.col(id_col).alias("__i"), to_double_array(vec_col).alias("__v"))
        # deterministic AND corpus-spread: ordering by a hash of the id
        # (id tiebreak) samples uniformly across the whole corpus
        # instead of its first train_cap ids — an id-ordered prefix is
        # only representative when ids are uncorrelated with content,
        # which a tiled/partitioned lake violates (measured: prefix
        # sampling on the 30x tile left 22 of 30 tiles' vectors
        # outside the training distribution, skewing cells and
        # inflating within-cell pairwise work ~4x). When the corpus
        # fits in train_cap the sample is the whole corpus either way.
        .orderBy(F.md5(F.col("__i").cast("string")), "__i")
        .limit(train_cap)
        .collect()
    )
    # id-sort the collected sample: the seeded init indexes into X by
    # position, so row order must not depend on the hash spread (and
    # when the corpus fits in train_cap this reproduces the original
    # id-ordered X bit-for-bit — goldens unchanged)
    sample = sorted(sample, key=lambda r: r["__i"])
    X = np.array([r["__v"] for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    # tiny-corpus clamp: k-means needs n_cells distinct seed rows
    n_cells = min(n_cells, len(X))
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(max_iter):
        # squared-L2 assignment, ties to the lowest cell id (argmin)
        # chunked: bit-identical to the full broadcast, bounded temp
        # (see _pairwise_d2 — the full (n, k, dim) temp was 15 GB at
        # k=240 and dominated wall clock)
        d2 = _pairwise_d2(X, cents)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [(i, [float(x) for x in c]) for i, c in enumerate(cents)]


def _cell_dists(vec_col: Column, centroids) -> Column:
    """array<struct<d,cell>> of squared-L2 distances to each centroid,
    built from LITERAL centroids — a pure per-row expression, so cell
    assignment is a narrow map with NO join and NO shuffle. vec_col
    must be a materialized column reference (see minhash_signature).

    The centroid matrix enters as ONE nested-array literal traversed
    by an indexed ``transform`` (not k*dim unrolled ``lit`` nodes):
    the generated code is then independent of both k and the centroid
    values, so Spark's codegen cache hits across IVF probes and every
    k-means round — this cut ~1s/compile per iteration at k=8,dim=64."""
    ids = F.lit([int(i) for i, _ in centroids])
    mat = F.lit([[float(x) for x in c] for _, c in centroids])
    return F.transform(
        mat,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.element_at(ids, i + F.lit(1)).alias("cell"),
        ),
    )


def _cell_only_vec_seq(centroids):
    """Cell-only variant of :func:`_cell_assign_vec_seq` replicating
    the expression form's EXACT semantics incl. its null corner: a
    NULL vector's distances are all null, null struct fields sort
    first in array_min, so the expression assigned the LOWEST cell id
    (empirically pinned) — the kernel does the same, as it does for
    all-NaN rows (NaN sorts last)."""
    order = sorted(range(len(centroids)), key=lambda i: int(centroids[i][0]))
    mat = np.array([centroids[i][1] for i in order], dtype=np.float64)
    cell_ids = np.array(
        [int(centroids[i][0]) for i in order], dtype=np.int64
    )
    lowest = int(cell_ids[0]) if len(cell_ids) else -1

    @F.pandas_udf("long")
    def assign(vs: pd.Series) -> pd.Series:
        vals = vs.tolist()
        mask = [v is not None for v in vals]
        X = np.array(
            [np.asarray(v, dtype=np.float64) for v, m in zip(vals, mask) if m]
        )
        out = np.full(len(vals), lowest, dtype=np.int64)
        if len(X) and len(cell_ids):
            d2 = _seq_d2(X, mat)
            best = np.where(np.isnan(d2), np.inf, d2).argmin(axis=1)
            out[np.array(mask)] = cell_ids[best]
        return pd.Series(out)

    return assign


def _cell_assign(df: DataFrame, centroids, vec_col: str, out: str) -> DataFrame:
    """Assign each vector to its nearest centroid (min by (d, cell)
    struct order — deterministic tiebreak), as a narrow map. r11: the
    interpreted ``array_min(_cell_dists(...))`` expression became the
    bit-identical sequential-summation Arrow kernel (see
    :func:`_seq_d2`); same values, same lowest-id ties, same null/NaN
    corners (pinned by tests)."""
    staged = df.withColumn("__v", to_double_array(vec_col))
    # coalesce: provably non-null cell id, else the candidate join's
    # inferred isnotnull(cell) re-evaluates the kernel a second time
    # per row (see operators.dedup non-null notes)
    return staged.withColumn(
        out,
        F.coalesce(
            _cell_only_vec_seq(centroids)(F.col("__v")),
            F.lit(-1),
        ),
    ).drop("__v")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized_assign: bool = False,
) -> DataFrame:
    """IVF approximate kNN: corpus vectors live in their nearest cell;
    each query probes its ``nprobe`` nearest cells. Candidate
    generation is an equi-join on cell id — the 100 TB plan — and
    recall grows with nprobe (property-tested against brute force).

    ``vectorized_assign``: corpus cell assignment via the Arrow/numpy
    kernel (``_cell_assign_vec``) instead of the literal-centroid
    expression. The expression form is interpreted per (row, cell), so
    its cost is O(N * k * dim) in SLOW per-element lambda dispatches —
    measured unusable past a few hundred cells (the n_cells ∝ N
    deployment discipline reaches thousands); the numpy kernel does
    the same argmin at memory bandwidth. Default OFF because the two
    forms may differ on sub-ulp distance ties (the documented 1-ulp
    pairwise-vs-sequential summation caveat), and the frozen golden
    pins the expression form at n_cells=8; property tests assert the
    two paths agree cell-for-cell on the fixtures."""
    if vectorized_assign:
        corpus_cells = corpus.withColumn(
            "__cell",
            _cell_assign_vec(centroids)(to_double_array(vec_col)),
        )
    else:
        corpus_cells = _cell_assign(corpus, centroids, vec_col, "__cell")

    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__qv")
        )
        .withColumn("__qn", norm(F.col("__qv")))
        .withColumn(
            "__probe",
            F.explode(
                F.slice(
                    F.array_sort(_cell_dists(F.col("__qv"), centroids)), 1, nprobe
                )
            ),
        )
        .select("query_id", "__qv", "__qn", F.col("__probe.cell").alias("__cell"))
    )

    cands = probes.join(
        corpus_cells.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("__cv"),
            "__cell",
        ).withColumn("__cn", norm(F.col("__cv"))),
        "__cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(cands, k, "query_id", "neighbor_id")
