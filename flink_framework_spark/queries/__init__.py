"""Import every query family so registration side-effects run."""

from flink_framework_spark.queries import (  # noqa: F401
    aggregates,
    functions_lib,
    joins,
    llm,
    projection,
    scan,
    setops,
    sort_limit,
    streaming_batch,
    udfs,
    windows,
)
