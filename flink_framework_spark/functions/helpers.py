"""Column-expression helpers shared across operators.

All helpers build Catalyst expressions (no Python row functions), so
they stay inside whole-stage codegen and scale to arbitrary data
volumes — the per-element array folds below are JVM higher-order
functions, not UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def round_duck(col: Column | str, scale: int) -> Column:
    """Round exactly like DuckDB's ROUND(DOUBLE, n).

    DuckDB computes ``std::round(x * 10^n) / 10^n`` (half away from
    zero on the *scaled double*), while Spark's ``round`` rounds the
    shortest decimal representation of x HALF_UP — they disagree for
    values whose scaled double sits just below .5 (e.g.
    307939.785 -> .79 in Spark, .78 in DuckDB). Scaling first makes
    Spark's integer-rounding agree with std::round for every double,
    so both engines produce bit-identical results.

    Known residual gap: an exactly-zero result from a negative input
    is -0.0 in DuckDB and +0.0 here (no query surface produces that
    case: all rounded outputs are either positive or exact multiples
    of the input's decimal grid).
    """
    p = F.lit(float(10**scale))
    return F.round(F.col(col) * p if isinstance(col, str) else col * p, 0) / p


def fmt_ts(col: Column | str) -> Column:
    """Render a timestamp as 'YYYY-MM-DD HH:MM:SS' (the oracle's
    strftime format) — deterministic for TIMESTAMP_NTZ inputs."""
    return F.date_format(col, TS_FMT)


def to_double_array(col: Column | str) -> Column:
    """array<float> -> array<double>; all similarity math runs in
    double so Spark and the DuckDB oracle agree bit-for-bit."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two double arrays.

    ``aggregate(zip_with(...))`` matches DuckDB's sequential summation
    order exactly, which keeps cosine scores bit-identical (SURVEY.md
    §5.3). At 100 TB scale the brute-force path is replaced by the
    blocked/bucketed operators in ``operators.similarity``, but the
    per-pair kernel stays this expression.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (DuckDB-compatible)."""
    return dot(a, b) / (norm(a) * norm(b))
