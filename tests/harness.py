"""Local replica of the driver's oracle comparison.

The driver compares each Spark query against its DuckDB oracle by
row-count + schema + order-insensitive value-hash. We replicate that
with a stricter check: exact value equality (after canonicalization)
on column-name-sorted, row-sorted frames, with type-family agreement
(an int result vs a float oracle fails even if numerically equal,
because a value-hash would differ).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from flink_framework_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v: Any) -> tuple[str, Any]:
    """(type-family, canonical value) for hashing/compare."""
    if v is None:
        return ("null", None)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", None)
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon = []
        for v in row:
            if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                canon.append(("null", None))
            else:
                if hasattr(v, "item"):  # numpy scalar
                    v = v.item()
                canon.append(_canon_cell(v))
        out.append(tuple(canon))
    out.sort(key=repr)
    return cols, out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    sp = spark_df.toPandas()
    du = run_oracle(oracle_sql, sf_dir)
    sp_cols, sp_rows = _canon_frame(sp)
    du_cols, du_rows = _canon_frame(du)
    assert sp_cols == du_cols, f"columns differ: spark={sp_cols} oracle={du_cols}"
    assert len(sp_rows) == len(du_rows), (
        f"row count differs: spark={len(sp_rows)} oracle={len(du_rows)}"
    )
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        assert a == b, (
            f"row {i} differs (after sorting):\n  spark : {a}\n  oracle: {b}"
        )


def canonical_hash(df_pandas: pd.DataFrame) -> dict:
    """Order-insensitive fingerprint of a result frame (the golden-file
    format): sha256 over sorted canonical rows + column names + count."""
    import hashlib

    cols, rows = _canon_frame(df_pandas)
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return {"columns": cols, "rows": len(rows), "sha256": h.hexdigest()}
