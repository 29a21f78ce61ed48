"""CLI for the engine.

    python -m flink_framework_spark list
    python -m flink_framework_spark run q_join_multi [--sf-dir DIR] [-n 20]
    python -m flink_framework_spark explain q_join_asof [--sf-dir DIR]
    python -m flink_framework_spark oracle q_join_multi
    python -m flink_framework_spark bench [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="flink_framework_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query")
        if name != "oracle":
            p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("-n", "--num-rows", type=int, default=20)
    p = sub.add_parser("bench")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")

    args = parser.parse_args(argv)

    from flink_framework_spark.registry import all_queries

    queries = all_queries()

    if args.cmd == "list":
        for name, q in sorted(queries.items()):
            oracle = "hash" if q.oracle else "rows"
            print(f"{name:24s} [{q.family or '-'}] ({oracle}) {q.doc.splitlines()[0] if q.doc else ''}")
        return 0

    if args.cmd == "oracle":
        q = queries.get(args.query)
        if q is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        print(q.oracle or "(rows-only: no oracle SQL)")
        return 0

    q = queries.get(args.query) if args.cmd in ("run", "explain") else None
    if args.cmd in ("run", "explain"):
        if q is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        from flink_framework_spark.session import get_spark

        spark = get_spark(app_name=f"ffs-{args.cmd}")
        df = q.fn(spark, args.sf_dir)
        if args.cmd == "run":
            df.show(args.num_rows, truncate=False)
        else:
            from flink_framework_spark.plans.inspect import formatted_plan

            print(formatted_plan(df))
        spark.stop()
        return 0

    if args.cmd == "bench":
        import os

        os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        sys.path.insert(0, __file__.rsplit("/", 2)[0])
        import bench

        bench.main()
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
