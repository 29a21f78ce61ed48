"""Query registry: the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers here as a named query — a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes this
registry to the driver; ``bench.py`` times it; tests compare each pair.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    oracle: Optional[str]  # DuckDB SQL, or None -> driver rows-only check
    family: str  # SURVEY.md §2 family letter (A..K)
    doc: str = ""
    bench: bool = True  # include in bench.py timing loop


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    family: str = "",
    bench: bool = True,
):
    """Decorator registering a query implementation."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            family=family,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Return the full registry (importing query modules on demand)."""
    import flink_framework_spark.queries  # noqa: F401  (side-effect: registration)

    return dict(_REGISTRY)
