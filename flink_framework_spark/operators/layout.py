"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A lake table range-partitioned on one column prunes scans only on
that column. Interleaving the bits of several bounded dimensions into
a Morton code and range-partitioning + sorting on the code gives
every dimension locality at once: each output file then covers a
narrow min/max range of *every* interleaved column, so footer-stats
pruning works for predicates on any of them. This is the standard
OPTIMIZE ZORDER BY technique; here it is a pure Catalyst integer
expression (shifts/masks, no UDF), so it runs in whole-stage codegen
and the layout write is one range-repartition + local sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(dims: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each dimension into one code.

    Dimension order gives bit significance: dims[0]'s bit i lands at
    position ``i * n_dims + (n_dims - 1)``, dims[-1]'s at
    ``i * n_dims``. Inputs must already be non-negative integers in
    ``[0, 2^bits)`` — callers bucketize continuous values first.
    Disjoint target bits make ``+`` equivalent to bitwise OR, which
    keeps the expression a plain sum both here and in ANSI-SQL
    oracles.
    """
    n = len(dims)
    terms = []
    for d_idx, d in enumerate(dims):
        for i in range(bits):
            pos = i * n + (n - 1 - d_idx)
            terms.append(F.shiftleft(F.shiftright(d, i).bitwiseAND(F.lit(1)), pos))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sort(
    df: DataFrame, code: Column, n_partitions: int | None = None
) -> DataFrame:
    """Lay ``df`` out in Morton order: range-repartition on the code
    (each output file owns a contiguous code range → tight per-file
    min/max on every interleaved dimension) and sort within
    partitions so row groups inherit the same locality."""
    code_df = df.withColumn("__z", code)
    parts = [F.col("__z")] if n_partitions is None else [n_partitions, F.col("__z")]
    return (
        code_df.repartitionByRange(*parts)
        .sortWithinPartitions("__z")
        .drop("__z")
    )
