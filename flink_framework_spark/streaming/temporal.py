"""Flink's event-time temporal TABLE join (``FOR SYSTEM_TIME AS OF
fact_ts``) on Structured Streaming: a fact stream enriched with the
dimension version that was valid at each fact's event time.

The batch twin (``operators.scd.temporal_join``) rewrites containment
to an as-of merge — one union shuffle + window. That plan is not
stream-executable (a global union-merge window over both inputs), so
the streaming form uses the EQUIVALENT containment join directly:
a stream-static equi-join on the key with the interval residual
``valid_from <= fact_ts < valid_to``. Equivalence is exactly the
half-open tiling invariant ``scd2_build`` guarantees — each key's
versions tile its timeline, so containment selects the same single
version the as-of merge picks (property-tested against the batch
twin, trigger-chunking invariant, in tests/test_streaming_joins.py).

Scale/semantics notes:
- stream-static joins re-resolve the static side per micro-batch when
  it is backed by a re-readable source (files/Delta) — Flink's
  "temporal table refresh" behavior falls out of the Spark contract;
  the dim is dimension-sized, so Catalyst broadcasts it per batch.
- ``how='inner'`` drops facts before a key's first version (Flink's
  default temporal join); ``'left'`` keeps them with null attributes.
- both sides' timestamp columns must share a comparable type (the
  caller aligns TIMESTAMP vs TIMESTAMP_NTZ; tests use instants).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_join_stream(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    how: str = "inner",
) -> DataFrame:
    """Enrich a streaming ``facts`` frame with the ``dim`` version
    valid at each row's ``fact_ts``. ``dim`` is ``scd2_build`` output
    (``valid_to`` null on each key's current version = open-ended)."""
    d = dim.drop("is_current")
    cond = None
    for k in on:
        c = facts[k] == d[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (facts[fact_ts] >= d["valid_from"])
        & (d["valid_to"].isNull() | (facts[fact_ts] < d["valid_to"]))
    )
    joined = facts.join(d, cond, how)
    # drop the dim's copy of the key columns and the interval bounds
    for k in on:
        joined = joined.drop(d[k])
    return joined.drop(d["valid_from"]).drop(d["valid_to"])
