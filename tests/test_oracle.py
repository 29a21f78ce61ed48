"""Every registered query vs its DuckDB oracle (driver-t2 replica)."""

from __future__ import annotations

import pytest

from flink_framework_spark.registry import all_queries
from tests.harness import assert_matches_oracle

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    import os

    q = QUERIES[name]
    oracle = q.oracle
    if q.oracle_by_sf:
        # Trained-model oracle with per-SF artifact literals: use the
        # variant for THIS SF in place — the value path is exercised
        # at every suite SF, no redirect (r11 de-pinning).
        tag = os.path.basename(sf_dir.rstrip("/"))
        sf_oracle = q.oracle_by_sf.get(tag)
        if sf_oracle is not None:
            oracle = sf_oracle
        else:
            # unknown custom SF dir: artifacts don't exist for it —
            # fall back to the driver SF like a pinned oracle
            sf_dir = f"/root/testdata/{q.oracle_sf or 'sf0.01'}"
    elif q.oracle_sf:
        # Golden-snapshot oracle: only valid at the SF it was frozen
        # at (the driver's sf0.01) — run the comparison there.
        sf_dir = f"/root/testdata/{q.oracle_sf}"
    df = q.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    names = {n for n, _ in e.queries().items()}
    oracles = e.oracle_sql()
    assert set(oracles) <= names
