"""Deterministic scale-up tiling of the sf0.1 fixtures, to measure
empirical scaling exponents (SCALING.md): T tiles of every fact table
with per-tile key offsets so the workload SHAPE is preserved:

- keys (custkey/suppkey/partkey/orderkey/doc_id/vec_id/event_id/
  user_id) are offset per tile, and the dimension tables are tiled
  with the SAME offsets, so every join stays valid and the join/graph
  cardinality grows linearly (tiling orders over a fixed customer set
  would instead densify the trade graph superlinearly).
- document TEXT gets a per-tile token prefix (tile 0 = original), so
  cross-tile shingle sets are disjoint: near-dup pair counts grow
  linearly with tiles, as a real growing corpus does — naive tiling
  would make every doc a T-way exact duplicate and near-dedup
  quadratic in T.
- embeddings keep their vectors (IVF cell occupancy grows linearly;
  queries stay the tile-0 vec_id < 10 set, so measured cost is
  per-query cost against a T-times-larger corpus).
- region/nation are fixed dimensions (realistic: they do not scale).

Usage: python tools/make_scale_data.py T OUT_DIR  (e.g. 10 /tmp/scaledata/t10)
Tile offsets are far above the sf0.1 key ranges and far below the
10M supplier-node offset used by queries.graph.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = {
    "cust": 100_000,
    "supp": 100_000,
    "part": 100_000,
    "order": 1_000_000,
    "doc": 100_000,
    "vec": 100_000,
    "event": 1_000_000,
    "user": 100_000,
}


def tile_sql(t: int) -> dict[str, str]:
    text_expr = (
        f"regexp_replace(text, '(\\S+)', 't{t}\\1', 'g')" if t else "text"
    )
    return {
        "customer": f"SELECT c_custkey + {t * OFF['cust']} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
        "supplier": f"SELECT s_suppkey + {t * OFF['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
        "part": f"SELECT p_partkey + {t * OFF['part']} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
        "orders": f"SELECT o_orderkey + {t * OFF['order']} AS o_orderkey, o_custkey + {t * OFF['cust']} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",
        "lineitem": (
            f"SELECT l_orderkey + {t * OFF['order']} AS l_orderkey, "
            f"l_partkey + {t * OFF['part']} AS l_partkey, "
            f"l_suppkey + {t * OFF['supp']} AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate FROM lineitem"
        ),
        "events": (
            f"SELECT event_id + {t * OFF['event']} AS event_id, ts, "
            f"user_id + {t * OFF['user']} AS user_id, event_type, value, props FROM events"
        ),
        "documents": (
            f"SELECT doc_id + {t * OFF['doc']} AS doc_id, {text_expr} AS text, "
            "lang, source, n_chars FROM documents"
        ),
        "embeddings": (
            f"SELECT vec_id + {t * OFF['vec']} AS vec_id, {_emb_expr(t)} AS "
            "embedding, label FROM embeddings"
        ),
    }


def _emb_expr(t: int) -> str:
    """Per-tile vector variation: rotate components by t (mod 64) and
    negate for t >= 64 — norm-preserving, deterministic, and (r, neg)
    is unique per tile for T <= 128. Without this every vector would
    be a T-way EXACT duplicate across tiles, making within-cell
    pairwise work (semantic dedup) quadratic in T — a tiling artifact,
    not corpus growth; a real growing corpus adds NEW vectors. For
    near-isotropic fixtures cosine(x, rotate(x, r)) is near zero, so
    cross-tile near-dup structure stays realistic (none), while IVF
    cell occupancy still grows linearly."""
    if t == 0:
        return "embedding"
    r = t % 64
    rot = f"(embedding[{r + 1}:] || embedding[:{r}])" if r else "embedding"
    if t >= 64:
        return f"list_transform({rot}, x -> -x)"
    return rot


def main() -> None:
    tiles = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tables = [
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ]
    for tbl in tables + ["region", "nation"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        )
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {tbl}) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl in tables:
        union = " UNION ALL ".join(tile_sql(t)[tbl] for t in range(tiles))
        con.execute(
            f"COPY ({union}) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
