"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from flink_framework_spark.functions.helpers import (  # noqa: F401
    cosine_sim,
    dot,
    fmt_ts,
    norm,
    round_duck,
    to_double_array,
)
