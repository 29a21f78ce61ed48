"""Near-dedup quality properties (SURVEY.md §5.2.3, K2).

MinHash/SimHash cannot be oracle-checked (seeded hash permutations
aren't reproducible in DuckDB SQL), so we prove them against ground
truth: plant near-duplicates with known perturbations and require
recall/precision floors.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.dedup import (
    jaccard_pairs,
    near_dup_pairs_minhash,
    ngram_near_dup_pairs,
    simhash_near_dup_pairs,
)

N_BASE = 120
N_DUP = 30
VOCAB = [f"w{i}" for i in range(400)]


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus of random docs + near-duplicates (2 word substitutions
    in ~50-word docs => shingle Jaccard ~0.75-0.9)."""
    rng = random.Random(7)
    rows = []
    for i in range(N_BASE):
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(50))))
    truth = set()
    for j in range(N_DUP):
        base_id = j
        words = rows[base_id][1].split()
        for _ in range(2):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        dup_id = N_BASE + j
        rows.append((dup_id, " ".join(words)))
        truth.add((base_id, dup_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, truth


def test_minhash_recovers_planted_dups(spark, planted):
    df, truth = planted
    found = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(df, threshold=0.5).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}: {sorted(truth - found)}"
    # precision against exact Jaccard ground truth: every reported
    # pair really is >= 0.5 (the verify stage guarantees this).
    all_pairs = spark.createDataFrame(
        [(a, b) for a, b in found], "doc_a long, doc_b long"
    )
    exact = jaccard_pairs(df, all_pairs).collect()
    assert all(r["jaccard"] >= 0.5 for r in exact)


def test_minhash_no_false_positives_on_random_docs(spark, planted):
    df, truth = planted
    found = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(df, threshold=0.5).collect()
    }
    # random 50-word docs over a 400-word vocab share almost no
    # 3-gram shingles — anything found beyond the planted set is a
    # false positive.
    assert found <= truth | {(b, a) for a, b in truth}


def test_ngram_blocked_matches_planted(spark, planted):
    df, truth = planted
    found = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_near_dup_pairs(df, threshold=0.5).collect()
    }
    recall = len(found & truth) / len(truth)
    # single-permutation blocking collides with probability ~= Jaccard
    assert recall >= 0.6
    assert found <= truth


def test_simhash_finds_planted_dups(spark, planted):
    df, truth = planted
    found = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(df, max_hamming=16).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.7
    # exactness: every returned pair really is within max_hamming of
    # the true fingerprints (the operator's recall-complete contract
    # cuts both ways)
    from flink_framework_spark.operators.dedup import (
        hashed_shingle_frame,
        simhash64_vec,
    )
    from pyspark.sql import functions as F

    fp = {
        r["__id"]: r["f"]
        for r in hashed_shingle_frame(df)
        .select(
            "__id",
            F.coalesce(simhash64_vec()(F.col("__shh")), F.lit(0)).alias(
                "f"
            ),
        )
        .collect()
    }
    for a, b in found:
        d = bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
        assert d <= 16, (a, b, d)
    # separation: independent random docs sit near Hamming 32, so
    # non-planted pairs within 16 bits are rare hash-draw events —
    # a handful at most across the ~11k pairs, never systematic
    # (under the round-9 portable 64-bit hash the fixture draws
    # exactly one, pair (47, 107) at distance 16)
    assert len(found - truth) <= 2, sorted(found - truth)


class TestEditDistancePairs:
    def test_planted_typos_guaranteed_recall(self, spark):
        from flink_framework_spark.operators.dedup import edit_distance_pairs

        rows = [
            (1, "shuffle"),
            (2, "shuffel"),   # transposition = distance 2 -> NOT found
            (3, "shuffles"),  # insertion     = distance 1
            (4, "shuffl"),    # deletion      = distance 1
            (5, "shiffle"),   # substitution  = distance 1
            (6, "broadcast"), # unrelated
        ]
        df = spark.createDataFrame(rows, ["id", "s"])
        pairs = {
            (r["id_a"], r["id_b"])
            for r in edit_distance_pairs(df, "id", "s").collect()
        }
        assert {(1, 3), (1, 4), (1, 5)} <= pairs
        assert all(6 not in p for p in pairs)
        assert (1, 2) not in pairs  # distance 2: correctly out of contract

    def test_identical_strings_distance_zero(self, spark):
        from flink_framework_spark.operators.dedup import edit_distance_pairs

        df = spark.createDataFrame([(1, "dup"), (2, "dup")], ["id", "s"])
        out = edit_distance_pairs(df, "id", "s").collect()
        assert len(out) == 1 and out[0]["dist"] == 0

    def test_no_cross_join_in_plan(self, spark, sf_dir):
        from flink_framework_spark.plans.inspect import formatted_plan
        from flink_framework_spark.registry import all_queries

        plan = formatted_plan(all_queries()["q_dedup_edit"].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestIncrementalDedup:
    def test_new_dups_of_corpus_dropped_fresh_kept(self, spark):
        from flink_framework_spark.operators.dedup import incremental_dedup_ngram

        base = "the quick brown fox jumps over the lazy dog again and again today"
        corpus = spark.createDataFrame(
            [(1, base), (2, "completely different content about query engines here")],
            ["doc_id", "text"],
        )
        new = spark.createDataFrame(
            [
                (100, base + " extra"),            # near-dup of corpus doc 1
                (101, "fresh unseen writing with novel phrasing throughout it all"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"] for r in incremental_dedup_ngram(new, corpus).collect()}
        assert out == {101}

    def test_does_not_dedup_within_new_batch(self, spark):
        from flink_framework_spark.operators.dedup import incremental_dedup_ngram

        dup = "identical new content repeated across the incoming batch rows"
        corpus = spark.createDataFrame(
            [(1, "existing corpus text unrelated to the batch entirely")],
            ["doc_id", "text"],
        )
        new = spark.createDataFrame(
            [(100, dup), (101, dup)], ["doc_id", "text"]
        )
        # intra-batch dups are the self-join operator's contract
        assert incremental_dedup_ngram(new, corpus).count() == 2


def test_simhash_combine_blocks_equivalent(spark, sf_dir):
    """combine_blocks=2 (squared key space, pair-combination keys)
    must return exactly the combine=1 pair set — the recall proof
    (two clean blocks always exist at d <= n_blocks - 2) made
    empirical."""
    from flink_framework_spark.operators.dedup import simhash_near_dup_pairs

    docs = table(spark, sf_dir, "documents")
    p1 = {tuple(r) for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()}
    p2 = {
        tuple(r)
        for r in simhash_near_dup_pairs(
            docs, max_hamming=8, combine_blocks=2
        ).collect()
    }
    assert p1 == p2 and len(p1) > 0


def test_simhash_combine_blocks_full_width_no_overflow(spark):
    """n_blocks=2 under combine_blocks=2 packs two FULL 32-bit blocks
    into one key; arithmetic packing (v*2^32) would overflow a signed
    long for v >= 2^31 and throw under ANSI mode — the bit-level
    shiftleft|OR packing must not."""
    from flink_framework_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta epsilon zeta " + ("x" * (i % 3)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    out = simhash_near_dup_pairs(
        docs, max_hamming=0, n_blocks=2, combine_blocks=2
    )
    assert out.count() > 0  # exact dups exist by construction


class TestSemanticDedup:
    """operators.similarity.semantic_dedup: planted-duplicate recall,
    orthogonal-vector precision, and the deterministic lowest-id keep
    rule (the golden + DuckDB recheck cover the fixture corpus)."""

    def _planted(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        base = rng.randn(6, 8)
        rows = []
        for i, v in enumerate(base):
            rows.append((i, [float(x) for x in v]))
        # 10..12: near-copies of base vectors 0..2 (tiny jitter, cosine
        # ~0.9999); 20: orthogonal one-hot far from everything
        for j, src in enumerate(base[:3]):
            rows.append((10 + j, [float(x) for x in src + 1e-3 * rng.randn(8)]))
        onehot = [0.0] * 8
        onehot[7] = 37.0
        rows.append((20, onehot))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_planted_near_copies_dropped_originals_kept(self, spark):
        from flink_framework_spark.operators.similarity import (
            semantic_dedup,
            train_ivf_centroids,
        )

        df = self._planted(spark)
        cents = train_ivf_centroids(df, n_cells=3)
        out = {r.vec_id: r for r in semantic_dedup(df, cents, eps=0.95).collect()}
        assert len(out) == 10  # one row per input vector
        for j in range(3):
            assert out[10 + j].kept == 0, (10 + j, out[10 + j])
            assert out[10 + j].dup_of == j  # lowest-id witness
            assert out[j].kept == 1  # original survives
        assert out[20].kept == 1  # orthogonal vector untouched

    def test_exact_duplicate_chain_keeps_lowest_id(self, spark):
        from flink_framework_spark.operators.similarity import (
            semantic_dedup,
            train_ivf_centroids,
        )

        # three identical vectors: only the lowest id is kept, and
        # every drop points at id 1 (the smallest witness), regardless
        # of partitioning
        v = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame(
            [(1, v), (5, v), (9, v)], "vec_id long, embedding array<double>"
        ).repartition(3)
        cents = train_ivf_centroids(df, n_cells=1)
        out = {r.vec_id: r for r in semantic_dedup(df, cents, eps=0.99).collect()}
        assert out[1].kept == 1 and out[1].dup_of is None
        assert out[5].kept == 0 and out[5].dup_of == 1
        assert out[9].kept == 0 and out[9].dup_of == 1


class TestDuplicatedSpans:
    """operators.dedup.duplicated_spans: planted shared passages are
    localized exactly; unique text produces no spans; within-doc
    repetition counts toward min_count."""

    def _docs(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        uniq1 = "one two three four five six seven eight nine ten"
        uniq2 = "red orange yellow green blue indigo violet black white gray"
        uniq3 = "cat dog fox owl elk bat ant bee cow pig"
        rep = "mu nu xi omicron pi rho sigma tau"
        uniq4 = "ash oak elm fir yew birch cedar pine maple larch"
        return spark.createDataFrame(
            [
                (1, f"{uniq1} {shared}"),          # shared at tokens 10..19
                (2, f"{shared} {uniq2}"),          # shared at tokens 0..9
                (3, uniq3),                        # no duplicated 8-grams
                (4, f"{rep} {uniq4} {rep}"),       # self-repeat at 0..7, 18..25
            ],
            "doc_id long, text string",
        )

    def test_planted_spans_localized(self, spark):
        from flink_framework_spark.operators.dedup import duplicated_spans

        out = duplicated_spans(self._docs(spark), n=8, min_count=2)
        spans = {
            r.doc_id: (r.span_start, r.span_end, r.n_dup_grams)
            for r in out.collect()
        }
        # the 10-token shared passage has 3 duplicated 8-gram starts
        assert spans[1] == (10, 19, 3)
        assert spans[2] == (0, 9, 3)
        assert 3 not in spans
        # self-repetition: both copies of the 8-token block flagged,
        # 18 apart (> n) so they stay separate islands
        four = sorted(
            (r.span_start, r.span_end)
            for r in out.filter("doc_id = 4").collect()
        )
        assert four == [(0, 7), (18, 25)]

    def test_overlapping_islands_merge(self, spark):
        from flink_framework_spark.operators.dedup import duplicated_spans

        # two docs share a 20-token passage -> ONE maximal span each,
        # not 13 overlapping 8-gram spans
        passage = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, f"pre1a pre1b {passage}"), (2, f"{passage} post2a post2b")],
            "doc_id long, text string",
        )
        out = duplicated_spans(df, n=8, min_count=2).collect()
        spans = {r.doc_id: (r.span_start, r.span_end, r.n_dup_grams) for r in out}
        assert len(out) == 2
        assert spans[1] == (2, 21, 13)
        assert spans[2] == (0, 19, 13)


class TestNewOperatorEdgeCases:
    def test_duplicated_spans_short_docs_and_no_dups(self, spark):
        from flink_framework_spark.operators.dedup import duplicated_spans

        df = spark.createDataFrame(
            [
                (1, "too short"),                       # < n tokens: excluded
                (2, "aa bb cc dd ee ff gg hh ii jj"),   # unique 8-grams
                (3, "kk ll mm nn oo pp qq rr ss tt"),
            ],
            "doc_id long, text string",
        )
        out = duplicated_spans(df, n=8, min_count=2)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "span_start", "span_end", "span_tokens", "n_dup_grams",
        ]

    def test_dsir_no_target_docs_still_scores(self, spark):
        from pyspark.sql import functions as F

        from flink_framework_spark.operators.curation import dsir_importance

        df = spark.createDataFrame(
            [(i, "alpha beta gamma", "xx") for i in range(6)],
            "doc_id long, text string, lang string",
        )
        out = dsir_importance(
            df, F.col("lang") == "en", n_buckets=16, select_n=3
        ).toPandas()
        # uniform-smoothed target LM: every doc gets the same finite
        # weight; the Gumbel tiebreak still selects exactly 3
        assert len(out) == 6
        assert out.logratio.notna().all()
        assert int(out.selected.sum()) == 3

    def test_gemm_topk_small_corpus(self, spark):
        from flink_framework_spark.operators.similarity import (
            brute_force_topk,
            gemm_topk,
        )

        df = spark.createDataFrame(
            [(i, [float(i + 1), float((i * 7) % 5), 1.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        got = sorted(map(tuple, gemm_topk(df, df, k=10).collect()))
        want = sorted(map(tuple, brute_force_topk(df, df, k=10).collect()))
        assert got == want  # k > corpus: all 3 neighbors each, same order


class TestSemanticDedupIncremental:
    def test_new_dups_of_corpus_dropped_fresh_and_intra_batch_kept(self, spark):
        import numpy as np

        from flink_framework_spark.operators.similarity import (
            semantic_dedup_incremental,
            train_ivf_centroids,
        )

        rng = np.random.RandomState(11)
        base = rng.randn(5, 8)
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(base)],
            "vec_id long, embedding array<double>",
        )
        dupv = [float(x) for x in base[2] + 1e-3 * rng.randn(8)]
        fresh = [float(x) for x in rng.randn(8) * 3]
        new = spark.createDataFrame(
            # 100: near-copy of corpus vec 2 -> dropped
            # 101/102: identical to each other but unseen -> BOTH kept
            #          (intra-batch dedup is semantic_dedup's job)
            [(100, dupv), (101, fresh), (102, fresh)],
            "vec_id long, embedding array<double>",
        )
        cents = train_ivf_centroids(corpus, n_cells=2)
        out = {
            r.vec_id: r
            for r in semantic_dedup_incremental(
                new, corpus, cents, eps=0.95
            ).collect()
        }
        assert len(out) == 8
        assert out[100].kept == 0 and out[100].dup_of == 2
        assert out[101].kept == 1 and out[102].kept == 1
        for i in range(5):  # corpus rows pass through untouched
            assert out[i].kept == 1 and out[i].is_new == 0

