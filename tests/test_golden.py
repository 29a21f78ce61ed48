"""Golden-file regression: every query's sf0.001 output must match the
frozen order-insensitive value hash (fast check, no DuckDB needed).
Regenerate intentionally with tools/freeze_golden.py.

Excluded: q_text_langid (model trained on a sample — stable, but its
tie-breaking is the one thing we allow to drift with library versions).
"""

from __future__ import annotations

import json
import os

import pytest

from flink_framework_spark.registry import all_queries
from tests.harness import canonical_hash

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_sf0.001.json")
SF_DIR = "/root/testdata/sf0.001"
SKIP = {"q_text_langid", "q_sim_topk_ivf"}

with open(GOLDEN_PATH) as f:
    GOLDEN = json.load(f)


@pytest.mark.parametrize("name", sorted(set(GOLDEN) - SKIP))
def test_golden(spark, name):
    q = all_queries()[name]
    got = canonical_hash(q.fn(spark, SF_DIR).toPandas())
    assert got == GOLDEN[name], f"{name}: output drifted from golden snapshot"
