"""Table loaders for the test lake.

The reference registers each typed stream ("subject") in a registry
and materializes it as a Kafka topic (SURVEY.md §1.1 [R]); here a
subject is simply a parquet table with a fixed schema, loaded lazily
so Catalyst sees the scan and can push filters/prune columns into it.

``_normalize_events_ts`` hides the one physical quirk of the
fixtures: the ``ts`` column's parquet encoding has varied across
driver-generated datasets (TIMESTAMP(NANOS) in early rounds — read as
a raw long via ``nanosAsLong`` and rebuilt with integer ``div 1000``;
TIMESTAMP(MICROS, isAdjustedToUTC=false) since — read natively as
TIMESTAMP_NTZ). Whatever the input type, the batch form is a
TIMESTAMP_NTZ whose wall-clock equals DuckDB's reading, and the
streaming form is the equivalent UTC instant (watermarks require an
instant type) — both *regardless of the session timezone*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_events_ts(df: DataFrame, as_instant: bool = False) -> DataFrame:
    """Normalize events.ts to µs precision, timezone-independently.

    Batch/oracle form (default): TIMESTAMP_NTZ whose wall-clock equals
    DuckDB's ns→µs truncation. Streaming form (``as_instant=True``):
    TIMESTAMP (absolute instant, same epoch µs) — required by Spark
    watermarks; the UTC rendering of that instant equals the NTZ value.
    """
    dtype = df.schema["ts"].dataType.simpleString()
    if dtype in ("bigint", "long"):
        instant = "timestamp_micros(ts div 1000)"
        expr = instant if as_instant else f"convert_timezone('UTC', {instant})"
        return df.withColumn("ts", F.expr(expr))
    if dtype == "timestamp":
        return df if as_instant else df.withColumn(
            "ts", F.expr("convert_timezone('UTC', ts)")
        )
    # timestamp_ntz input (µs-precision fixtures): the batch/oracle
    # form IS the stored wall-clock. The instant form interprets that
    # wall-clock as UTC via an epoch diff against the NTZ epoch —
    # session-timezone-independent (a plain CAST would not be).
    if as_instant:
        return df.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
            ),
        )
    return df


# Lazy-DataFrame cache (r11, guide §6 file listing / §1.2 fixed costs):
# ``spark.read.parquet`` re-reads footers + re-infers the schema on
# EVERY call (~0.1-0.2 s of driver-side py4j work per table), and the
# bench corpus calls ``table()`` ~2-4 times per query per timing run.
# The cached object is a PLAN (no data, no results — .persist is never
# called here), keyed per (SparkSession, application) so a restarted
# session re-lists files and a SECOND session in one application never
# receives a DataFrame bound to the first session's state (ADVICE
# r11); within one session the fixture lake is immutable, as is a
# production lake snapshot during one job — rewriting files under
# sf_dir mid-session is outside this cache's contract.
_TABLE_CACHE: dict[tuple[int, str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; events gets its timestamp normalized."""
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # pragma: no cover - e.g. Connect sessions
        app = None
    key = (id(spark), app, sf_dir, name)
    if app is not None:
        hit = _TABLE_CACHE.get(key)
        if hit is not None:
            return hit
    if name == "events":
        configure_session(spark)  # driver sessions may lack nanosAsLong
        df = _normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if app is not None:
        _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load every table; optionally register temp views for SQL entry."""
    dfs = {t: table(spark, sf_dir, t) for t in TABLES}
    if register_views:
        for t, df in dfs.items():
            df.createOrReplaceTempView(t)
    return dfs
