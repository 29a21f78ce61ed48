"""Bucketed grouped-map dispatch: ``groupBy(keys).applyInPandas(fn)``
with the per-key Python/Arrow overhead amortized (r12, guide §4).

``groupBy(key).applyInPandas`` pays ~4 ms of Arrow framing + Python
call overhead PER GROUP — the dominant cost whenever an operator's
groups are small and numerous (match frames with hundreds of
burst-sized groups, celled GEMM blocks, per-start pick stages).
Grouping by a deterministic hash BUCKET of the key and iterating the
true keys inside each bucket's pandas frame costs ~50 µs per key
instead, while keeping applyInPandas's ClusteredDistribution
guarantee (every row of a key lands in exactly one pandas frame).

Why not ``repartition(key).sortWithinPartitions(key).mapInPandas``:
that spelling is NOT a reliable contract — Catalyst can elide the
repartition exchange when it believes the child is already
partitioned compatibly (observed over a Union whose children were
each hash-partitioned on the key), leaving a key's rows split across
partitions and the group scan silently wrong. The grouped-map
requirement is declared to the planner here, so the exchange can
never be dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_map(
    df: DataFrame,
    key_cols: list[str] | str,
    bucket_fn,
    schema,
    buckets: int = 64,
) -> DataFrame:
    """Dispatch ``bucket_fn`` over ``buckets`` deterministic hash
    buckets of ``key_cols``: the function receives each bucket's WHOLE
    pandas frame (every row of every key hashing to the bucket) and
    returns that bucket's output rows. This is the primitive the
    per-key convenience wrapper below builds on; use it directly when
    the per-key work can itself be amortized bucket-wide (one sort /
    one scan per bucket instead of per key)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def run(pdf):
        return bucket_fn(pdf.drop(columns="__gb"))

    bucketed = df.withColumn(
        "__gb",
        F.pmod(F.xxhash64(*[F.col(c) for c in keys]), F.lit(buckets)),
    )
    return bucketed.groupBy("__gb").applyInPandas(run, schema)


def grouped_map_batched(
    df: DataFrame,
    key_cols: list[str] | str,
    fn,
    schema,
    buckets: int = 64,
) -> DataFrame:
    """Equivalent of ``df.groupBy(*key_cols).applyInPandas(fn, schema)``
    (``fn`` receives each key group exactly as applyInPandas would,
    minus any row-order guarantee neither form gives), dispatched over
    ``buckets`` hash buckets. Output row order differs from the
    per-key form — callers aggregate or treat output as a set, as
    applyInPandas callers already must."""
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if hasattr(schema, "fields"):
        out_names = [f.name for f in schema.fields]
    else:  # flat DDL string: "a long, b double"
        out_names = [s.strip().split()[0] for s in str(schema).split(",")]
    gb_keys = keys if len(keys) > 1 else keys[0]

    def bucket_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        outs = [
            fn(g.reset_index(drop=True))
            for _, g in pdf.groupby(gb_keys, sort=False, dropna=False)
        ]
        outs = [o for o in outs if len(o)]
        if outs:
            return pd.concat(outs, ignore_index=True)
        return pd.DataFrame(columns=out_names)

    return bucketed_map(df, keys, bucket_fn, schema, buckets)
