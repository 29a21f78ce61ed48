"""Plan-quality guardrails: the properties that make these operators
viable at 100 TB, pinned as assertions so regressions fail fast.

(SURVEY.md §4.2: Catalyst provides these — this suite proves we
actually *get* them, i.e. nothing in our expressions blocks pushdown,
pruning, or join selection.)
"""

from __future__ import annotations

from flink_framework_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schemas,
)
from flink_framework_spark.registry import all_queries

QUERIES = all_queries()


def _df(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    pushed = " ".join(pushed_filters(_df(spark, sf_dir, "q_filter_pred")))
    for fragment in ("l_shipdate", "GreaterThan(l_discount,0.03)", "In(l_returnflag"):
        assert fragment in pushed, pushed


def test_column_pruning_projection(spark, sf_dir):
    """A 3-output-column query must scan exactly the 4 source columns
    it needs — not the 11-column lineitem schema."""
    schemas = read_schemas(_df(spark, sf_dir, "q_select_project"))
    assert schemas == [
        "l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_discount:double"
    ]


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = _df(spark, sf_dir, "q_join_multi")
    assert has_broadcast_hash_join(df)
    # scans are pruned to the join/agg columns only
    for schema in read_schemas(df):
        assert len(schema.split(",")) <= 6, schema


def test_broadcast_hint_respected(spark, sf_dir):
    assert has_broadcast_hash_join(_df(spark, sf_dir, "q_join_broadcast"))


def test_global_sort_limit_is_take_ordered(spark, sf_dir):
    """orderBy().limit() must compile to TakeOrderedAndProject (per-
    partition top-N + tiny merge), never a full global sort."""
    assert "TakeOrderedAndProject" in formatted_plan(
        _df(spark, sf_dir, "q_sort_limit")
    )


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The union-merge as-of join's defining property: ONE shuffle of
    |L|+|R| rows (hashpartitioning by key), no pair blow-up."""
    assert count_exchanges(_df(spark, sf_dir, "q_join_asof")) == 1


def test_agg_is_partial_then_final(spark, sf_dir):
    """groupBy().agg must plan map-side partial aggregation."""
    plan = formatted_plan(_df(spark, sf_dir, "q_agg_pricing"))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_scan_filters_pushed_on_dedup_blocking(spark, sf_dir):
    """Near-dedup must be equi-join based — no CartesianProduct or
    BroadcastNestedLoopJoin may appear in any dedup plan."""
    for name in (
        "q_dedup_ngram",
        "q_dedup_embed",
        "q_dedup_minhash",
        "q_dedup_edit",
        "q_dedup_incremental",
        "q_dedup_semantic",
        "q_dedup_spans",
    ):
        plan = formatted_plan(_df(spark, sf_dir, name))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_no_rdd_fallback_anywhere(spark, sf_dir):
    """Every registered query compiles to a pure SQL physical plan
    (scans + SQL operators) — no RDD scan nodes; Python appears only
    via Arrow-vectorized eval operators, never row-at-a-time batch
    conversion (the one deliberate row UDF is q_udf_python)."""
    # q_sim_topk_ivf broadcasts a driver-side trained artifact (the
    # k-means centroid list) as a local-collection DataFrame — a
    # deliberate, bounded-size exception to the no-local-RDD rule.
    # q_dedup_clusters and q_pagerank run driver-coordinated
    # iteration loops whose per-round localCheckpoint is the required
    # lineage cut for iterative plans (without it the plan doubles
    # every round); the checkpointed frames are the compact per-node
    # state (labels / fixed-point ranks), not fact data.
    # q_kcore's h-index coreness loop localCheckpoints per round —
    # the same required lineage cut as q_pagerank/q_dedup_clusters
    # (the checkpointed frame is per-node integer state, not facts).
    local_artifact_ok = {
        "q_sim_topk_ivf",
        "q_dedup_clusters",
        "q_pagerank",
        "q_kcore",
        "q_cluster_graph_suite",  # embeds q_pagerank's checkpointed loop
        "q_split_cluster_safe",   # embeds connected_components' loop
    }
    for name, q in QUERIES.items():
        plan = formatted_plan(q.fn(spark, sf_dir))
        if name not in local_artifact_ok:
            assert "Scan ExistingRDD" not in plan, name
        # q_udf_python is the deliberate J1 row-UDF contract;
        # q_udtf_ngrams is the deliberate J5 Python-UDTF contract
        # (plans as BatchEvalPythonUDTF) — both are API demos kept
        # off hot paths, every other query must stay JVM-side.
        if name not in ("q_udf_python", "q_udtf_ngrams"):
            assert "BatchEvalPython" not in plan, name


def test_media_decode_never_reshuffles_payloads(spark, sf_dir, tmp_path):
    """The multimodal decode stage must be a narrow map over the scan:
    raw payload bytes reach the Arrow boundary without ever crossing
    an Exchange (at media scale a payload shuffle IS the outage), and
    a metadata-only projection prunes the payload column at the scan."""
    from pyspark.sql import functions as F

    from flink_framework_spark.io import table
    from flink_framework_spark.operators.multimodal import (
        attach_payload,
        decode_media,
    )

    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "media.parquet")
    attach_payload(docs, "doc_id", "text").write.parquet(path)
    media = spark.read.parquet(path)

    plan = formatted_plan(decode_media(media))
    assert "Exchange" not in plan, plan
    # downstream agg shuffles only the narrow decoded features
    agg = decode_media(media).groupBy("width").agg(F.count(F.lit(1)))
    assert count_exchanges(agg) == 1
    # metadata-only projection: payload pruned at the parquet scan
    schemas = " ".join(read_schemas(media.select("media_id", "meta.mime")))
    assert "payload" not in schemas, schemas
    assert "media_id" in schemas
