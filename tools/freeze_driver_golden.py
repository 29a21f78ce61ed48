"""Freeze golden parquet snapshots for deterministic-but-not-SQL-
expressible queries (seeded MinHash permutations, SimHash bit math,
k-means IVF cells), so the driver's DuckDB oracle can value-check them
via ``read_parquet`` instead of a rows-only pass.

Determinism: all three queries are seeded and shuffle-invariant
(verified by running under different core counts / partition counts —
identical canonical hashes). Regenerate after intentionally changing
their semantics:

    python tools/freeze_driver_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_framework_spark.registry import all_queries  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402

SF = "sf0.01"  # the driver's correctness scale factor
SF_DIR = f"/root/testdata/{SF}"
GOLDEN_QUERIES = (
    "q_dedup_embed_cells",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_simhash128",
    "q_sim_topk_ivf",
    "q_sim_topk_imi",
    "q_sim_topk_ivfpq",
    "q_dedup_clusters",
    "q_dedup_semantic",
    "q_dedup_semantic_imi",
    "q_dedup_semantic_inc",
    "q_kmeans",
    "q_pagerank",
    "q_kcore",
    "q_quality_model",
    "q_bpe_vocab",
    "q_hll_rollup",
)
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden_driver",
)


def main() -> None:
    # argv selects a subset (freshly added queries) so re-freezing one
    # golden never touches the others' bytes
    only = set(sys.argv[1:])
    targets = [q for q in GOLDEN_QUERIES if not only or q in only]
    unknown = only - set(GOLDEN_QUERIES)
    if unknown:
        raise SystemExit(f"not in GOLDEN_QUERIES: {sorted(unknown)}")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="freeze-driver-golden")
    qs = all_queries()
    for name in targets:
        tbl = qs[name].fn(spark, SF_DIR).toArrow()
        path = os.path.join(OUT_DIR, f"{name}_{SF}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
