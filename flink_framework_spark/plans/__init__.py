"""Plan inspection & assertion helpers (the engine's .explain tooling)."""

from flink_framework_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schemas,
)
