"""Composite / custom operators the built-in DataFrame API lacks.

Each module implements one capability Spark has no single native
operator for, expressed as a composition of native operators wherever
semantics allow (SURVEY.md §4.3) so Catalyst still optimizes the plan.
"""

from flink_framework_spark.operators.asof import asof_join  # noqa: F401
from flink_framework_spark.operators.topk import top_k_per_group  # noqa: F401
