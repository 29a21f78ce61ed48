"""Import every query family so registration side-effects run."""

from flink_framework_spark.queries import (  # noqa: F401
    aggregates,
    curation,
    dedup_ext,
    driver_suite,
    functions_lib,
    graph,
    joins,
    llm,
    multimodal_q,
    projection,
    retrieval,
    scan,
    setops,
    sort_limit,
    streaming_batch,
    text_analysis,
    tpch,
    tpch_ext,
    udfs,
    windows,
)
