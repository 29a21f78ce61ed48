"""SQL entry point (SURVEY.md §3.2 Entry 2): the same Catalyst IR is
reachable via spark.sql over registered views — spot-checked equal to
the DataFrame spelling for representative queries."""

from __future__ import annotations

from flink_framework_spark.io import load_tables
from flink_framework_spark.registry import all_queries


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(repr, df.toPandas()[cols].itertuples(index=False, name=None)))


def test_sql_entry_matches_dataframe_entry(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)
    sql_vs_df = {
        "q_join_inner": """
            SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice) * 100.0, 0) / 100.0 AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "q_win_topn": """
            SELECT * FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
              FROM orders) t
            WHERE rn <= 3
        """,
        "q_stream_dedup": "SELECT DISTINCT user_id, event_type FROM events",
    }
    for name, sql in sql_vs_df.items():
        df_result = _rows(all_queries()[name].fn(spark, sf_dir))
        sql_result = _rows(spark.sql(sql))
        assert sql_result == df_result, name
