"""Flink SQL statement demo: run the statements a Flink SQL user
already has, unchanged, against the parquet lake.

Five statements tour the dialect shim (``flink_framework_spark.sql``):
a TUMBLE window TVF aggregate, a CUMULATE early-firing rollup, a
SESSION TVF with PARTITION BY inside the call, a funnel spelled as
FROM-embedded MATCH_RECOGNIZE with an outer filter, and the
Flink-docs V-pattern (PREV() navigation, a lazy ``+?`` run, a
composite partition key, and a FINAL measure). The TVF and match
relations rewrite onto the engine's operators; everything else in
each statement is Spark SQL running through Catalyst untouched.

Run:  python examples/flink_sql_statements.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_framework_spark.io import table  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402
from flink_framework_spark.sql import flink_sql  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="flink-sql-statements")
    tables = {"events": table(spark, sf_dir, "events")}

    print("== TUMBLE TVF: hourly event-type counts ==")
    flink_sql(spark, """
        SELECT window_start, event_type, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
        ORDER BY n DESC LIMIT 5
    """, tables=tables).show(truncate=False)

    print("== CUMULATE TVF: the running 'hour so far' ==")
    flink_sql(spark, """
        SELECT window_start, window_end, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sumv
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                            INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
        ORDER BY window_start, window_end LIMIT 8
    """, tables=tables).show(truncate=False)

    print("== SESSION TVF: busiest 30-min-gap sessions per user ==")
    flink_sql(spark, """
        SELECT user_id, window_start, window_end, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end
        ORDER BY n DESC LIMIT 5
    """, tables=tables).show(truncate=False)

    print("== MATCH_RECOGNIZE in FROM: signup->purchase funnels ==")
    flink_sql(spark, """
        SELECT user_id, first_id, last_id, n_rows
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES S.event_id AS first_id, P.event_id AS last_id,
                   COUNT(*) AS n_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S F* P)
          WITHIN INTERVAL '1' DAY
          DEFINE S AS S.event_type = 'signup',
                 F AS F.event_type <> 'error',
                 P AS P.event_type = 'purchase'
        ) WHERE n_rows > 2
        ORDER BY n_rows DESC LIMIT 5
    """, tables=tables).show(truncate=False)

    print("== MATCH_RECOGNIZE V-pattern: PREV() navigation, lazy "
          "run, composite key ==")
    # the Flink-docs flagship shape: a falling-value run bottoming
    # out into a recovery, keyed by (user_id, event_type), with the
    # run's depth reported both running and FINAL
    flink_sql(spark, """
        SELECT user_id, event_type, bottom_v, n_down
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id, event_type ORDER BY ts
          MEASURES LAST(DOWN.value) AS bottom_v,
                   FINAL COUNT(DOWN.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT DOWN+? UP)
          DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
                 UP AS UP.value >= PREV(UP.value)
        )
        ORDER BY n_down DESC LIMIT 5
    """, tables=tables).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
