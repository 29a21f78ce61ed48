"""Skew-handling joins (SURVEY.md §2 K6).

AQE's skew-join splitting handles most skew at runtime; this operator
is the explicit fallback for *pathological* hot keys (a single key
holding >> one partition's worth of rows — the classic null-key or
celebrity-entity problem in web-scale joins): salt the probe side into
``salt`` sub-keys and replicate the build side once per sub-key, so
the hot key spreads over ``salt`` tasks at the cost of a bounded
build-side blow-up.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with salted keys.

    ``left`` (the big/skewed side) gets a per-row salt in [0, salt);
    ``right`` is replicated once per salt value (explode of a
    ``salt``-element array — acceptable when right is the smaller
    side). Result equals ``left.join(right, on, how)`` for inner/left
    joins; per-key parallelism increases by ``salt``x.
    """
    keys = list(on)
    lsalted = left.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rsalted, keys + ["__salt"], how)
    return out.drop("__salt")
