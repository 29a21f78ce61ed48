"""Type-2 slowly-changing dimension build + point-in-time lookup.

The reference world models this as a *temporal table*: a changelog
stream keyed by primary key, registered as a versioned table, with a
``TemporalTableFunction`` join giving each probe row the version valid
at its event time (Flink's temporal table join; SURVEY.md §2 C10 [F]
is the same primitive viewed as an as-of join). Warehouses spell the
stored form "SCD type 2": one row per (key, version) carrying
``valid_from`` / ``valid_to`` / ``is_current``.

Spark-first shape:

1. ``scd2_build`` — changelog → versioned dimension in ONE shuffle:
   hash-partition by key, sort by (ts, seq); a ``lag`` window drops
   rows whose tracked attributes equal the previous snapshot (change
   compression — a changelog that re-states an unchanged row must not
   open a new version); ``lead``/``row_number`` over the surviving
   rows close each version at the next one's start. The filter
   preserves the partitioning, so the second window reuses the first
   exchange (plan-asserted in tests/test_scd.py: exactly one
   shuffle).
2. ``temporal_join`` — probe rows → the version valid at their
   timestamp. Because ``scd2_build`` tiles each key's timeline
   (``valid_to`` = next ``valid_from``, half-open intervals), the
   containment join ``valid_from <= t < valid_to`` degenerates to an
   as-of join on ``valid_from`` — delegated to ``operators.asof``
   (single merge-style shuffle, no pair blow-up, no state).

Scale: both steps are linear in |changelog| + |probes| with exactly
one shuffle each — the same asymptotics Flink's keyed-state temporal
join pays, with Tungsten codegen and AQE skew handling for free. At
100 TB the dimension is tiny next to the facts; the as-of merge
shuffles facts once on the join key, identical to any co-located
fact-dim join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_framework_spark.operators.asof import asof_join


def scd2_build(
    changelog: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse a changelog into type-2 dimension versions.

    Input: one row per observed snapshot ``(keys, ts, attrs)``.
    Output: one row per version — keys, attrs, ``valid_from`` (the
    snapshot that opened the version), ``valid_to`` (the next
    version's start; null for the current version), 1-based
    ``version`` and ``is_current``.

    Rows restating attributes identical to the key's previous
    snapshot are compressed away. When several snapshots share one
    timestamp, ``seq_col`` breaks the tie and only the LAST snapshot
    per (keys, ts) is considered — a version's ``valid_from`` is
    unique per key, which ``temporal_join`` relies on.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)

    snap = changelog.select(*keys, ts_col, *([seq_col] if seq_col else []), *attrs)
    if seq_col is not None:
        # Last snapshot wins within a timestamp: a row survives iff
        # the next row (same key, (ts, seq) order) has a different
        # ts. Spelled as a lead() on the SAME window spec as the
        # passes below — keys-only partitioning — so the whole build
        # stays on one exchange (the filters preserve partitioning).
        snap = (
            snap.withColumn("__next_ts", F.lead(ts_col).over(w))
            .filter(
                F.col("__next_ts").isNull()
                | (F.col("__next_ts") != F.col(ts_col))
            )
            .drop("__next_ts")
        )

    attr_struct = F.struct(*[F.col(c) for c in attrs])
    changed = (
        snap.withColumn("__prev", F.lag(attr_struct).over(w))
        .filter(~F.col("__prev").eqNullSafe(attr_struct))
        .drop("__prev")
    )
    return changed.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row gets the dimension version
    valid at its timestamp (``valid_from <= fact_ts < valid_to``).

    ``dim`` is ``scd2_build`` output (or any versioned table whose
    intervals tile each key's timeline half-open); the containment
    predicate then equals "latest ``valid_from`` at-or-before the
    fact", i.e. an as-of join — one merged shuffle, no range
    explosion. Facts before a key's first version drop (``inner``) or
    keep null attributes (``left``).
    """
    payload = dim.drop("valid_to", "is_current")
    return asof_join(
        facts,
        payload,
        on=list(on),
        left_time=fact_ts,
        right_time="valid_from",
        how=how,
    )
