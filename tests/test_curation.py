"""Curation-operator properties beyond the oracle checks: split
stability, packing bounds, and exact decontamination behavior on a
planted fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.curation import (
    assign_split,
    decontaminate,
    pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


def test_split_is_stable_and_key_consistent(spark):
    """Same key -> same split on every evaluation and under appends
    (decision is per-key hash, not positional)."""
    docs = table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id").collect()}
    # append-simulation: a subset must receive identical assignments
    sub = docs.filter(F.col("doc_id") % 3 == 0)
    b = {r["doc_id"]: r["split"] for r in assign_split(sub, "doc_id").collect()}
    assert all(a[k] == v for k, v in b.items())
    # all three splits materialize with sane proportions on 500 docs
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_packing_respects_target_budget(spark):
    """A bin's docs start strictly inside the target budget; offsets
    are consistent with the running sum."""
    out = pack_sequences(
        table(spark, SF_DIR, "documents"), target_tokens=512,
        partition_cols=("lang",),
    ).collect()
    for r in out:
        assert 0 <= r["bin_offset"] < 512
        assert r["bin"] >= 0
    # bins are dense per lang: max bin == floor(total_tokens_before_last/512)
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["bin"] == cum // 512
            assert r["bin_offset"] == cum % 512
            cum += r["n_tokens"]


def test_decontaminate_removes_exactly_overlapping_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, base + " filler one"),          # contains the full 8-gram
            (2, "unrelated words entirely different content here now ok"),
            (3, "alpha beta gamma delta epsilon zeta eta NOPE x y"),  # 7-gram only
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(train, bench).collect()}
    assert kept == {2, 3}


def test_domain_mixture_shares_sum_to_one(spark):
    from flink_framework_spark.operators.curation import domain_mixture

    out = domain_mixture(
        table(spark, SF_DIR, "documents"), targets={"src0": 0.5}
    ).collect()
    assert abs(sum(r["actual_share"] for r in out) - 1.0) < 1e-4
    for r in out:
        if r["domain"] == "src0":
            assert r["target_share"] == 0.5 and r["repeat_factor"] > 0
        else:
            assert r["target_share"] == 0.0 and r["repeat_factor"] == 0.0


def test_dedup_clusters_collapse_transitive_chains(spark):
    """A~B and B~C (A!~C directly) must share one cluster with one
    survivor; unrelated docs stay singletons."""
    from flink_framework_spark.operators.dedup import dedup_clusters

    words20 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu xi omicron pi rho sigma tau upsilon ")
    base = words20 * 2                               # J(1 word swap) ~ 0.74
    mid = base.replace("theta", "townhall")          # ~ base (J ~ 0.74)
    far = mid.replace("sigma", "sheriff")            # ~ mid, J(base) ~ 0.54
    rows = [(1, base), (2, mid), (3, far),
            (4, "completely different vocabulary with no overlap at all " * 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_clusters(df, threshold=0.6).collect()}
    assert len(out) == 4
    assert out[1]["cluster"] == out[2]["cluster"] == out[3]["cluster"] == 1
    assert out[1]["cluster_size"] == 3
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[4]["cluster"] == 4 and out[4]["cluster_size"] == 1 and out[4]["keep"]


def test_repetition_stats_flags_degenerate_text(spark):
    from flink_framework_spark.operators.text import repetition_stats

    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top_word_frac"] == 1.0
    assert out[1]["dup_word_frac"] > 0.8
    assert out[1]["dup_bigram_frac"] == 0.8  # 5 bigrams, 1 distinct
    assert out[2]["top_word_frac"] == 0.1
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["dup_bigram_frac"] == 0.0


class TestWeightedSample:
    def test_huge_weight_always_selected(self, spark):
        from flink_framework_spark.operators.curation import weighted_sample

        rows = [(i, "g", 1.0) for i in range(200)] + [(999, "g", 1e9)]
        df = spark.createDataFrame(rows, ["id", "grp", "w"])
        out = weighted_sample(df, "id", "w", n=5, strata_col="grp")
        assert 999 in {r["id"] for r in out.collect()}

    def test_n_exceeding_group_returns_all(self, spark):
        from flink_framework_spark.operators.curation import weighted_sample

        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 3.0)], ["id", "grp", "w"]
        )
        assert weighted_sample(df, "id", "w", n=10, strata_col="grp").count() == 2

    def test_deterministic_across_partitioning(self, spark):
        from flink_framework_spark.operators.curation import weighted_sample

        rows = [(i, "g" if i % 2 else "h", float(1 + i % 7)) for i in range(500)]
        df = spark.createDataFrame(rows, ["id", "grp", "w"])
        a = sorted(
            map(tuple, weighted_sample(df.repartition(3), "id", "w", 20, "grp").collect())
        )
        b = sorted(
            map(tuple, weighted_sample(df.repartition(17), "id", "w", 20, "grp").collect())
        )
        assert a == b

    def test_global_topn_without_strata(self, spark):
        from flink_framework_spark.operators.curation import weighted_sample

        rows = [(i, float(1 + i % 5)) for i in range(100)]
        df = spark.createDataFrame(rows, ["id", "w"])
        assert weighted_sample(df, "id", "w", n=10).count() == 10


class TestDsirImportance:
    """operators.curation.dsir_importance: target-like docs outrank
    off-domain docs, output is one row per doc, exactly select_n are
    selected, and the result is partition-invariant."""

    def _corpus(self, spark):
        import pyspark.sql.functions as F  # noqa: F401

        rows = []
        # 10 in-domain docs (vocab A) marked as target
        for i in range(10):
            rows.append((i, "alpha beta gamma delta " * 5, "en"))
        # 10 raw docs that LOOK in-domain
        for i in range(10, 20):
            rows.append((i, "alpha beta gamma delta " * 5, "xx"))
        # 20 off-domain docs (vocab B)
        for i in range(20, 40):
            rows.append((i, "zeta eta theta iota " * 5, "xx"))
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_target_like_docs_outrank_and_get_selected(self, spark):
        from pyspark.sql import functions as F

        from flink_framework_spark.operators.curation import dsir_importance

        out = dsir_importance(
            self._corpus(spark),
            target_pred=F.col("lang") == "en",
            n_buckets=64,
            select_n=15,
        ).toPandas()
        assert len(out) == 40
        assert int(out.selected.sum()) == 15
        # every in-domain-looking doc outweighs every off-domain doc
        in_dom = out[out.doc_id < 20].logratio
        off_dom = out[out.doc_id >= 20].logratio
        assert in_dom.min() > off_dom.max()
        # Gumbel noise is bounded enough here that the 15 selected all
        # come from the 20 in-domain-looking docs
        assert set(out[out.selected == 1].doc_id) <= set(range(20))

    def test_partition_invariant(self, spark):
        from pyspark.sql import functions as F

        from flink_framework_spark.operators.curation import dsir_importance

        base = self._corpus(spark)
        a = dsir_importance(
            base.repartition(7), F.col("lang") == "en", 64, 15
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        b = dsir_importance(
            base.coalesce(1), F.col("lang") == "en", 64, 15
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


def test_curation_pipeline_funnel_consistent(spark, sf_dir):
    """The funnel is internally consistent: stage counts are monotone
    non-increasing and the split rows partition the decontam
    survivors (docs and tokens)."""
    from flink_framework_spark.operators.curation import curation_pipeline
    from flink_framework_spark.io import table

    rows = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in curation_pipeline(table(spark, sf_dir, "documents")).collect()
    }
    order = ["1_raw", "2_quality", "3_exact_dedup", "4_near_dedup", "5_decontam"]
    for a, b in zip(order, order[1:]):
        assert rows[a][0] >= rows[b][0], (a, b, rows)
    split_docs = sum(rows[s][0] for s in rows if s.startswith("split:"))
    split_toks = sum(rows[s][1] for s in rows if s.startswith("split:"))
    assert (split_docs, split_toks) == rows["5_decontam"]
    assert rows["1_raw"][0] > rows["5_decontam"][0]  # gates actually fire


def test_cluster_safe_split_never_separates_near_dups(spark, sf_dir):
    """The leakage guard itself: every near-dup pair's two docs get
    the same split, and every doc appears exactly once."""
    from flink_framework_spark.registry import all_queries
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.dedup import ngram_near_dup_pairs

    out = all_queries()["q_split_cluster_safe"].fn(spark, sf_dir).toPandas()
    docs_n = table(spark, sf_dir, "documents").count()
    assert len(out) == docs_n and out.doc_id.is_unique
    split_of = dict(zip(out.doc_id, out.split))
    pairs = ngram_near_dup_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5
    ).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert split_of[r.doc_a] == split_of[r.doc_b], (r.doc_a, r.doc_b)
