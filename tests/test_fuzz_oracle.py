"""Cross-engine fuzz: seeded random aggregation queries rendered from
ONE AST to both a DataFrame plan and DuckDB SQL, compared exactly.

The registered oracle suite pins hand-written pairs; this generator
covers the combinatorial space between them (scan/join x predicate
combos x group keys x aggregate sets x having). The grammar is
restricted to operations that are bit-exact across engines:

- aggregates: COUNT(*), COUNT(DISTINCT int), MIN/MAX (no FP
  arithmetic — stored values only), SUM over BIGINT-cast integral
  columns and over 0/1 CASE flags (associative integer math; the SQL
  side re-casts DuckDB's HUGEINT sum to BIGINT);
- group keys: low-cardinality strings, int modulos, substr/upper,
  CASE buckets, year(timestamp) (tz-independent on NTZ data);
- predicates: numeric/string/year comparisons, BETWEEN, AND/OR/NOT;
- no ORDER BY/LIMIT (the compare is order-insensitive; LIMIT without
  a total order is nondeterministic by design).

Every seed is deterministic, so a failure is a reproducible
counterexample, not flake.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from tests.harness import assert_matches_oracle

N_SEEDS = 40


# ---- grammar pieces: (spark_column_fn, sql_text) -----------------

GROUP_KEYS = [
    (lambda: F.col("l_returnflag"), "l_returnflag"),
    (lambda: F.col("l_linestatus"), "l_linestatus"),
    (lambda: F.col("l_partkey") % 7, "l_partkey % 7"),
    (lambda: F.col("l_suppkey") % 5, "l_suppkey % 5"),
    (lambda: F.year("l_shipdate"), "year(l_shipdate)"),
    (
        lambda: F.when(F.col("l_quantity") > 25, "hi").otherwise("lo"),
        "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END",
    ),
    (
        lambda: F.upper(F.substring("l_returnflag", 1, 1)),
        "upper(substr(l_returnflag, 1, 1))",
    ),
]

JOIN_GROUP_KEYS = [
    (lambda: F.col("o_orderstatus"), "o_orderstatus"),
    (lambda: F.col("o_orderpriority"), "o_orderpriority"),
    (lambda: F.year("o_orderdate"), "year(o_orderdate)"),
]

AGGS = [
    (
        lambda: F.countDistinct("l_partkey"),
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT)",
    ),
    (lambda: F.min("l_extendedprice"), "MIN(l_extendedprice)"),
    (lambda: F.max("l_discount"), "MAX(l_discount)"),
    (lambda: F.min("l_returnflag"), "MIN(l_returnflag)"),
    (
        lambda: F.sum(F.col("l_quantity").cast("long")),
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)",
    ),
    (
        lambda: F.sum(
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0).cast("long")
        ),
        "CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    (lambda: F.max(F.col("l_orderkey")), "MAX(l_orderkey)"),
]

JOIN_AGGS = [
    (lambda: F.min("o_totalprice"), "MIN(o_totalprice)"),
    (
        lambda: F.countDistinct("o_custkey"),
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT)",
    ),
]


def _predicates(rng: random.Random, joined: bool):
    out = []
    q = rng.choice([5, 10, 20, 30, 40, 45])
    op = rng.choice(["<", "<=", ">", ">=", "="])
    ops = {
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "=": lambda a, b: a == b,
    }
    out.append(
        (
            lambda: ops[op](F.col("l_quantity"), F.lit(q)),
            f"l_quantity {op} {q}",
        )
    )
    flag = rng.choice(["A", "N", "R"])
    out.append(
        (lambda: F.col("l_returnflag") == flag, f"l_returnflag = '{flag}'")
    )
    lo = rng.choice([0.01, 0.02, 0.03])
    hi = rng.choice([0.06, 0.08, 0.1])
    out.append(
        (
            lambda: F.col("l_discount").between(lo, hi),
            f"l_discount BETWEEN {lo} AND {hi}",
        )
    )
    y = rng.choice([1993, 1995, 1997])
    yop = rng.choice(["<", ">="])
    out.append(
        (
            lambda: ops[yop](F.year("l_shipdate"), F.lit(y)),
            f"year(l_shipdate) {yop} {y}",
        )
    )
    if joined:
        st = rng.choice(["O", "F", "P"])
        out.append(
            (
                lambda: F.col("o_orderstatus") == st,
                f"o_orderstatus = '{st}'",
            )
        )
    return out


def gen_query(seed: int):
    """One seeded AST -> (spark_fn, sql). Deterministic per seed."""
    rng = random.Random(seed)
    joined = rng.random() < 0.4

    keypool = GROUP_KEYS + (JOIN_GROUP_KEYS if joined else [])
    aggpool = AGGS + (JOIN_AGGS if joined else [])
    keys = rng.sample(keypool, rng.randint(0, 2))
    aggs = rng.sample(aggpool, rng.randint(1, 3))

    pool = _predicates(rng, joined)
    preds = rng.sample(pool, rng.randint(0, 2))
    combiner = rng.choice(["AND", "OR"])
    having_n = rng.choice([None, 2, 10])

    key_sql = [f"{sql} AS k{i}" for i, (_, sql) in enumerate(keys)]
    agg_sql = [f"{sql} AS a{i}" for i, (_, sql) in enumerate(aggs)]
    sel = ", ".join(key_sql + agg_sql + ["CAST(COUNT(*) AS BIGINT) AS cnt"])
    src = (
        "lineitem JOIN orders ON l_orderkey = o_orderkey"
        if joined
        else "lineitem"
    )
    sql = f"SELECT {sel} FROM {src}"
    if preds:
        sql += " WHERE " + f" {combiner} ".join(
            f"({p})" for _, p in preds
        )
    if keys:
        sql += " GROUP BY " + ", ".join(
            f"k{i}" for i in range(len(keys))
        )
    if having_n is not None:
        sql += (
            f" HAVING COUNT(*) > {having_n}"
            if keys
            else ""
        )

    def fn(spark, sf_dir):
        df = table(spark, sf_dir, "lineitem")
        if joined:
            od = table(spark, sf_dir, "orders")
            df = df.join(od, df.l_orderkey == od.o_orderkey)
        if preds:
            conds = [p() for p, _ in preds]
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c if combiner == "AND" else cond | c
            df = df.filter(cond)
        key_cols = [k().alias(f"k{i}") for i, (k, _) in enumerate(keys)]
        agg_cols = [a().alias(f"a{i}") for i, (a, _) in enumerate(aggs)]
        agg_cols.append(F.count(F.lit(1)).alias("cnt"))
        if key_cols:
            out = df.groupBy(*key_cols).agg(*agg_cols)
            if having_n is not None:
                out = out.filter(F.col("cnt") > having_n)
        else:
            out = df.agg(*agg_cols)
        return out

    return fn, sql


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- window-function fuzz ----------------------------------------
# Determinism rule: every window ORDER BY ends with the unique
# (l_orderkey, l_linenumber) tiebreak, so ranking/offset/frame
# results are total-order-deterministic; rank() additionally only
# depends on its sort key so ties are safe by construction.

PART_KEYS = [
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
]

ORDER_COLS = [
    ("l_extendedprice", "l_extendedprice"),
    ("l_quantity", "l_quantity"),
    ("l_shipdate", "l_shipdate"),
]


def gen_window_query(seed: int):
    rng = random.Random(10_000 + seed)
    pk, pk_sql = rng.choice(PART_KEYS)
    oc, oc_sql = rng.choice(ORDER_COLS)
    desc = rng.random() < 0.5
    wfn = rng.choice(["row_number", "rank", "runsum", "lag"])
    topn = rng.choice([3, 10])

    dirn = "DESC" if desc else "ASC"
    # l_quantity completes the total order: the synthetic corpus has
    # duplicate (l_orderkey, l_linenumber) rows at sf0.1 (84 shared
    # (shipdate, orderkey, linenumber) keys with DIFFERENT
    # quantities), and a running sum over an ambiguous tie order is
    # legitimately engine-dependent — caught by the sf0.1 fuzz run
    order_sql = f"{oc_sql} {dirn}, l_orderkey, l_linenumber, l_quantity"
    over = f"PARTITION BY {pk_sql} ORDER BY {order_sql}"
    if wfn == "row_number":
        w_sql, where = f"ROW_NUMBER() OVER ({over})", f"w <= {topn}"
    elif wfn == "rank":
        w_sql, where = (
            f"CAST(RANK() OVER (PARTITION BY {pk_sql} "
            f"ORDER BY {oc_sql} {dirn}) AS BIGINT)",
            f"w <= {topn}",
        )
    elif wfn == "runsum":
        w_sql, where = (
            f"CAST(SUM(CAST(l_quantity AS BIGINT)) OVER ({over} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS BIGINT)",
            None,
        )
    else:
        w_sql, where = f"LAG(l_orderkey) OVER ({over})", None
    sql = (
        f"SELECT * FROM (SELECT {pk_sql} AS k, l_orderkey, l_linenumber, "
        f"{oc_sql} AS oc, {w_sql} AS w FROM lineitem) t"
        + (f" WHERE {where}" if where else "")
    )

    def fn(spark, sf_dir):
        from pyspark.sql import Window

        df = table(spark, sf_dir, "lineitem")
        ocol = F.col(oc).desc() if desc else F.col(oc).asc()
        full = Window.partitionBy(pk).orderBy(
            ocol, "l_orderkey", "l_linenumber", "l_quantity"
        )
        if wfn == "row_number":
            w = F.row_number().over(full)
        elif wfn == "rank":
            w = (
                F.rank()
                .over(Window.partitionBy(pk).orderBy(ocol))
                .cast("long")
            )
        elif wfn == "runsum":
            w = F.sum(F.col("l_quantity").cast("long")).over(
                full.rowsBetween(Window.unboundedPreceding, 0)
            )
        else:
            w = F.lag("l_orderkey").over(full)
        out = df.select(
            F.col(pk).alias("k"),
            "l_orderkey",
            "l_linenumber",
            F.col(oc).alias("oc"),
            w.alias("w"),
        )
        if where:
            out = out.filter(F.col("w") <= topn)
        return out

    return fn, sql


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_window_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_window_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- set-operation fuzz ------------------------------------------

SETOP_PROJ = [
    (
        lambda df: df.select(
            F.col("l_returnflag").alias("c1"),
            F.col("l_quantity").cast("long").alias("c2"),
        ),
        "SELECT l_returnflag AS c1, CAST(l_quantity AS BIGINT) AS c2 "
        "FROM lineitem",
    ),
    (
        lambda df: df.select(
            F.upper("l_linestatus").alias("c1"),
            (F.col("l_suppkey") % 11).alias("c2"),
        ),
        "SELECT upper(l_linestatus) AS c1, l_suppkey % 11 AS c2 "
        "FROM lineitem",
    ),
]


def gen_setop_query(seed: int):
    rng = random.Random(20_000 + seed)
    proj, proj_sql = rng.choice(SETOP_PROJ)
    pool = _predicates(rng, joined=False)
    (pa, pa_sql), (pb, pb_sql) = rng.sample(pool, 2)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    sql = (
        f"({proj_sql} WHERE {pa_sql}) {op} ({proj_sql} WHERE {pb_sql})"
    )

    def fn(spark, sf_dir):
        df = table(spark, sf_dir, "lineitem")
        a = proj(df.filter(pa()))
        b = proj(df.filter(pb()))
        if op == "UNION":
            return a.union(b).distinct()
        if op == "UNION ALL":
            return a.union(b)
        if op == "INTERSECT":
            return a.intersect(b)
        return a.subtract(b)

    return fn, sql


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_setop_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_setop_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- outer/semi/anti join fuzz -----------------------------------
# Left side: per-order lineitem rollup (unique key, integer values);
# right side: filtered orders. Outer-join nulls exercise the
# null-canonicalization path of the compare.


def gen_join_query(seed: int):
    rng = random.Random(30_000 + seed)
    jt = rng.choice(["LEFT", "FULL", "SEMI", "ANTI"])
    st = rng.choice(["O", "F", "P"])
    qmin = rng.choice([10, 25, 40])

    li_sql = (
        "SELECT l_orderkey AS k, CAST(SUM(CAST(l_quantity AS BIGINT)) "
        "AS BIGINT) AS qty, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM lineitem WHERE l_quantity >= {qmin} GROUP BY l_orderkey"
    )
    od_sql = (
        "SELECT o_orderkey AS k, o_orderstatus AS st FROM orders "
        f"WHERE o_orderstatus = '{st}'"
    )
    if jt in ("LEFT", "FULL"):
        sql = (
            f"SELECT a.k AS lk, a.qty, a.n, b.k AS rk, b.st "
            f"FROM ({li_sql}) a {jt} JOIN ({od_sql}) b ON a.k = b.k"
        )
    else:
        sql = (
            f"SELECT a.k AS lk, a.qty, a.n FROM ({li_sql}) a "
            f"{jt} JOIN ({od_sql}) b ON a.k = b.k"
        )

    def fn(spark, sf_dir):
        li = (
            table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") >= qmin)
            .groupBy(F.col("l_orderkey").alias("k"))
            .agg(
                F.sum(F.col("l_quantity").cast("long")).alias("qty"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        od = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == st)
            .select(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st"))
        )
        if jt in ("LEFT", "FULL"):
            how = "left" if jt == "LEFT" else "full"
            return li.join(od, li.k == od.k, how).select(
                li.k.alias("lk"), "qty", "n", od.k.alias("rk"), "st"
            )
        how = "semi" if jt == "SEMI" else "anti"
        return li.join(od, li.k == od.k, how).select(
            F.col("k").alias("lk"), "qty", "n"
        )

    return fn, sql


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_join_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_join_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- scalar-function fuzz (string/date/conditional projections) --
# Exact-by-construction: string ops on ASCII data, date-part
# extraction on NTZ timestamps, integer arithmetic. Each seed
# projects 2-3 scalar expressions (plus the row key) under a filter.

SCALARS = [
    (
        lambda: F.upper(F.col("o_orderpriority")),
        "upper(o_orderpriority)",
    ),
    (
        lambda: F.lower(F.concat_ws("|", "o_orderstatus", "o_orderpriority")),
        "lower(concat_ws('|', o_orderstatus, o_orderpriority))",
    ),
    (
        lambda: F.substring("o_orderpriority", 1, 3),
        "substr(o_orderpriority, 1, 3)",
    ),
    (
        lambda: F.length("o_orderpriority").cast("long"),
        "CAST(length(o_orderpriority) AS BIGINT)",
    ),
    (
        lambda: F.regexp_replace("o_orderpriority", "[0-9]", "#"),
        "regexp_replace(o_orderpriority, '[0-9]', '#', 'g')",
    ),
    (
        lambda: F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ),
        "replace(o_orderpriority, '-', '_')",
    ),
    (lambda: F.year("o_orderdate"), "year(o_orderdate)"),
    (lambda: F.month("o_orderdate"), "month(o_orderdate)"),
    (lambda: F.dayofmonth("o_orderdate"), "day(o_orderdate)"),
    (
        lambda: F.date_format(F.date_trunc("month", "o_orderdate"),
                              "yyyy-MM-dd"),
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')",
    ),
    (
        lambda: (F.col("o_orderkey") * 31 + 7) % 1000,
        "(o_orderkey * 31 + 7) % 1000",
    ),
    (
        lambda: F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small"),
        "CASE WHEN o_totalprice > 150000 THEN 'big' "
        "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END",
    ),
    (
        lambda: F.coalesce(F.nullif("o_orderstatus", F.lit("O")),
                           F.lit("open")),
        "COALESCE(NULLIF(o_orderstatus, 'O'), 'open')",
    ),
    (
        lambda: F.greatest(
            F.year("o_orderdate"), (F.col("o_custkey") % 2000) + 100
        ),
        "GREATEST(year(o_orderdate), (o_custkey % 2000) + 100)",
    ),
]


def gen_scalar_query(seed: int):
    rng = random.Random(40_000 + seed)
    exprs = rng.sample(SCALARS, rng.randint(2, 3))
    y = rng.choice([1993, 1995, 1997])
    st = rng.choice(["O", "F", "P"])
    pred_sql = rng.choice(
        [f"year(o_orderdate) >= {y}", f"o_orderstatus = '{st}'"]
    )
    sel = ", ".join(f"{sql} AS c{i}" for i, (_, sql) in enumerate(exprs))
    sql = f"SELECT o_orderkey, {sel} FROM orders WHERE {pred_sql}"

    def fn(spark, sf_dir):
        df = table(spark, sf_dir, "orders")
        pred = (
            F.year("o_orderdate") >= y
            if pred_sql.startswith("year")
            else F.col("o_orderstatus") == st
        )
        return df.filter(pred).select(
            "o_orderkey",
            *[e().alias(f"c{i}") for i, (e, _) in enumerate(exprs)],
        )

    return fn, sql


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_scalar_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_scalar_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- grouping-sets fuzz (ROLLUP / CUBE / GROUPING SETS) ----------
# NULL fill of rolled-up keys and GROUPING() markers behave
# identically in both engines; aggregates reuse the exact set.

GS_KEYS = [
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    (
        "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END",
        "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END",
    ),
]


def gen_groupingsets_query(seed: int):
    rng = random.Random(50_000 + seed)
    (k1_spark, k1_sql), (k2_spark, k2_sql) = rng.sample(GS_KEYS, 2)
    mode = rng.choice(["ROLLUP", "CUBE", "SETS"])
    q = rng.choice([0, 10, 30])
    aggs_sql = (
        "CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, "
        "MIN(l_extendedprice) AS mn"
    )
    if mode == "SETS":
        grp = "GROUPING SETS ((k1), (k2), ())"
    else:
        grp = f"{mode}(k1, k2)"
    sql = (
        f"SELECT k1, k2, CAST(GROUPING(k1) AS BIGINT) AS g1, "
        f"CAST(GROUPING(k2) AS BIGINT) AS g2, {aggs_sql} FROM ("
        f"SELECT {k1_sql} AS k1, {k2_sql} AS k2, l_quantity, "
        f"l_extendedprice FROM lineitem WHERE l_quantity >= {q}) t "
        f"GROUP BY {grp}"
    )

    def fn(spark, sf_dir):
        df = (
            table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") >= q)
            .select(
                F.expr(k1_spark).alias("k1"),
                F.expr(k2_spark).alias("k2"),
                "l_quantity",
                "l_extendedprice",
            )
        )
        if mode == "ROLLUP":
            grouped = df.rollup("k1", "k2")
        elif mode == "CUBE":
            grouped = df.cube("k1", "k2")
        else:
            grouped = df.groupingSets(
                [["k1"], ["k2"], []], "k1", "k2"
            )
        return grouped.agg(
            F.grouping("k1").cast("long").alias("g1"),
            F.grouping("k2").cast("long").alias("g2"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.min("l_extendedprice").alias("mn"),
        ).select("k1", "k2", "g1", "g2", "cnt", "qty", "mn")

    return fn, sql


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_groupingsets_matches_oracle(spark, sf_dir, seed):
    fn, sql = gen_groupingsets_query(seed)
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


# ---- SQL-text fuzz: ONE ANSI string, both engines ----------------
# Exercises the spark.sql entry path (parser + subquery planning)
# that the DataFrame generators above bypass: correlated EXISTS /
# NOT EXISTS / IN / scalar-subquery shapes written in the common
# dialect and executed verbatim by Catalyst AND DuckDB.


def gen_sqltext_query(seed: int) -> str:
    rng = random.Random(60_000 + seed)
    q = rng.choice([20, 35, 45])
    st = rng.choice(["O", "F", "P"])
    shape = rng.choice(["exists", "not_exists", "in", "scalar"])
    if shape == "exists":
        return (
            "SELECT o_orderkey, o_orderstatus FROM orders o WHERE "
            f"o_orderstatus = '{st}' AND EXISTS (SELECT 1 FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > {q})"
        )
    if shape == "not_exists":
        return (
            "SELECT o_orderkey FROM orders o WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
            f"AND l.l_quantity > {q})"
        )
    if shape == "in":
        return (
            "SELECT o_orderkey, o_orderpriority FROM orders WHERE "
            "o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE "
            f"l_quantity > {q}) AND o_orderstatus = '{st}'"
        )
    return (
        "SELECT o_orderkey, (SELECT CAST(COUNT(*) AS BIGINT) FROM "
        "lineitem l WHERE l.l_orderkey = o.o_orderkey AND "
        f"l.l_quantity > {q}) AS n_big FROM orders o WHERE "
        f"o.o_orderstatus = '{st}'"
    )


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_sqltext_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.io import table as load

    sql = gen_sqltext_query(seed)
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    assert_matches_oracle(spark.sql(sql), sql, sf_dir)


# ---- grammar 9: CEP sequence / negation patterns over events ------
#
# Random step sequences with random event-time horizons, half of them
# negated with a random absent type, rendered to the cep operators on
# the Spark side and to chained self-joins (+ NOT EXISTS for the
# negation) on the DuckDB side. Directly fuzzes the round-4 CEP
# surface beyond the hand-written q_cep_* pairs.

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_cep_query(seed: int):
    rng = random.Random(70_000 + seed)
    n_steps = rng.choice([2, 2, 3])  # bias to 2-step (3-step is rarer)
    steps = rng.sample(_EVENT_TYPES, n_steps)
    minutes = rng.choice([15, 45, 120, 720])
    negate = rng.random() < 0.5
    absent = None
    if negate:
        absent = rng.choice([t for t in _EVENT_TYPES if t not in steps])

    aliases = [f"e{i}" for i in range(n_steps)]
    join_sql = f"FROM events {aliases[0]}"
    for i in range(1, n_steps):
        a, p = aliases[i], aliases[i - 1]
        join_sql += (
            f"\nJOIN events {a} ON {a}.user_id = {aliases[0]}.user_id"
            f" AND {a}.event_type = '{steps[i]}'"
            f" AND {a}.ts > {p}.ts"
            f" AND {a}.ts <= {aliases[0]}.ts + INTERVAL '{minutes} minutes'"
        )
    where = f"WHERE {aliases[0]}.event_type = '{steps[0]}'"
    if negate:
        where += (
            f"\n  AND NOT EXISTS (SELECT 1 FROM events x"
            f" WHERE x.user_id = {aliases[0]}.user_id"
            f" AND x.event_type = '{absent}'"
            f" AND x.ts > {aliases[0]}.ts"
            f" AND x.ts < {aliases[-1]}.ts)"
        )
    sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,"
        " COUNT(DISTINCT e0.user_id) AS n_users\n"
        + join_sql
        + "\n"
        + where
    )
    return steps, f"{minutes} MINUTES", absent, sql


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_cep_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.operators.cep import (
        match_sequence,
        match_sequence_negated,
    )

    steps, within, absent, sql = gen_cep_query(seed)
    ev = table(spark, sf_dir, "events")
    if seed % 2 == 1:
        # odd seeds render through the fluent Pattern builder — the
        # lowering must be transparent, so the same oracle applies
        from flink_framework_spark.operators.pattern import Pattern

        p = Pattern.begin(steps[0])
        for s in steps[1:]:
            p = p.followed_by(s)
        if absent is not None:
            p = p.not_followed_by(absent)
        m = p.within(within).match(ev)
    elif absent is None:
        m = match_sequence(ev, steps, within)
    else:
        m = match_sequence_negated(ev, steps, absent, within)
    got = m.agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert_matches_oracle(got, sql, sf_dir)


def gen_cep_optional_query(seed: int):
    """Random 3-step sequence with a random optional step (middle or
    last): the oracle is the UNION ALL of the full chain and the
    reduced chain — exactly the NO_SKIP both-branches semantics."""
    rng = random.Random(80_000 + seed)
    steps = rng.sample(_EVENT_TYPES, 3)
    opt_idx = rng.choice([1, 2])
    minutes = rng.choice([120, 720, 2880])

    def chain(idxs):
        aliases = [f"e{i}" for i in idxs]
        sql = f"FROM events {aliases[0]}"
        for k in range(1, len(idxs)):
            a, p = aliases[k], aliases[k - 1]
            sql += (
                f"\nJOIN events {a} ON {a}.user_id = {aliases[0]}.user_id"
                f" AND {a}.event_type = '{steps[idxs[k]]}'"
                f" AND {a}.ts > {p}.ts"
                f" AND {a}.ts <= {aliases[0]}.ts + INTERVAL '{minutes} minutes'"
            )
        sql += f"\nWHERE {aliases[0]}.event_type = '{steps[idxs[0]]}'"
        return f"SELECT {aliases[0]}.user_id {sql}"

    kept = [i for i in range(3) if i != opt_idx]
    sql = (
        "WITH u AS (\n"
        + chain([0, 1, 2])
        + "\nUNION ALL\n"
        + chain(kept)
        + "\n)\nSELECT CAST(COUNT(*) AS BIGINT) AS n_matches,"
        " COUNT(DISTINCT user_id) AS n_users FROM u"
    )
    return steps, opt_idx, f"{minutes} MINUTES", sql


def gen_cep_first_query(seed: int):
    """Random 2-3 step chains under FIRST-occurrence selection: the
    oracle chains one rn=1 CTE per step (earliest qualifying event
    per prefix, ties by event_id) — Flink's followedBy proper."""
    rng = random.Random(90_000 + seed)
    n_steps = rng.choice([2, 3])
    steps = rng.sample(_EVENT_TYPES, n_steps)
    minutes = rng.choice([120, 720, 2880])

    sql = (
        f"WITH f0 AS (SELECT user_id, ts AS ts_0, event_id AS id_0"
        f" FROM events WHERE event_type = '{steps[0]}')"
    )
    for i in range(1, n_steps):
        prev_ids = ", ".join(f"id_{j}" for j in range(i))
        prev_cols = ", ".join(
            f"f{i-1}.ts_{j}, f{i-1}.id_{j}" for j in range(i)
        )
        sql += (
            f", f{i} AS (SELECT user_id, {', '.join(f'ts_{j}' for j in range(i + 1))},"
            f" {', '.join(f'id_{j}' for j in range(i + 1))} FROM ("
            f"SELECT f{i-1}.user_id, {prev_cols},"
            f" e.ts AS ts_{i}, e.event_id AS id_{i},"
            f" ROW_NUMBER() OVER (PARTITION BY f{i-1}.user_id, {prev_ids}"
            f" ORDER BY e.ts, e.event_id) AS rn"
            f" FROM f{i-1} JOIN events e"
            f" ON e.user_id = f{i-1}.user_id"
            f" AND e.event_type = '{steps[i]}'"
            f" AND e.ts > f{i-1}.ts_{i-1}"
            f" AND e.ts <= f{i-1}.ts_0 + INTERVAL '{minutes} minutes')"
            f" WHERE rn = 1)"
        )
    sql += (
        f"\nSELECT CAST(COUNT(*) AS BIGINT) AS n_matches,"
        f" COUNT(DISTINCT user_id) AS n_users FROM f{n_steps - 1}"
    )
    return steps, f"{minutes} MINUTES", sql


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cep_first_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.operators.cep import match_sequence_first

    steps, within, sql = gen_cep_first_query(seed)
    ev = table(spark, sf_dir, "events")
    got = match_sequence_first(ev, steps, within).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert_matches_oracle(got, sql, sf_dir)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cep_optional_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.operators.cep import match_optional

    steps, opt_idx, within, sql = gen_cep_optional_query(seed)
    ev = table(spark, sf_dir, "events")
    got = match_optional(ev, steps, opt_idx, within).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert_matches_oracle(got, sql, sf_dir)


def gen_cep_group_query(seed: int):
    """Random GroupPattern unroll: optional one-step prefix, a 1-2
    step group repeated times(m, n) with m in {1,2} and n in
    {m, m+1}, one follower step — rendered to the Pattern builder on
    the Spark side and to a UNION ALL of chained-CTE join chains (one
    per repetition count) on the DuckDB side. CTE chaining forces the
    linear join order (DuckDB mis-plans the flat 5-way self-join)."""
    rng = random.Random(110_000 + seed)
    g = rng.choice([1, 2])
    group = rng.sample(_EVENT_TYPES, g)
    m = rng.choice([1, 2])
    n = m + rng.choice([0, 1])
    prefix = (
        rng.sample([t for t in _EVENT_TYPES if t not in group], 1)
        if rng.random() < 0.5
        else []
    )
    follower = rng.choice(_EVENT_TYPES)
    minutes = rng.choice([120, 720, 2880])
    while len(prefix) + n * g + 1 > 10:
        n -= 1

    def chain_cte(steps, tag):
        ctes = [
            f"{tag}0 AS (SELECT user_id, ts AS ts0, ts AS prev,"
            f" event_id AS pid FROM events"
            f" WHERE event_type = '{steps[0]}')"
        ]
        for i in range(1, len(steps)):
            ctes.append(
                f"{tag}{i} AS (SELECT {tag}{i-1}.user_id,"
                f" {tag}{i-1}.ts0, e.ts AS prev, e.event_id AS pid"
                f" FROM {tag}{i-1} JOIN events e"
                f" ON e.user_id = {tag}{i-1}.user_id"
                f" AND e.event_type = '{steps[i]}'"
                f" AND e.ts > {tag}{i-1}.prev"
                f" AND e.ts <= {tag}{i-1}.ts0"
                f" + INTERVAL '{minutes} minutes')"
            )
        return ctes, f"{tag}{len(steps) - 1}"

    parts, finals = [], []
    for r in range(m, n + 1):
        steps_r = prefix + group * r + [follower]
        ctes, last = chain_cte(steps_r, f"r{r}_")
        parts.extend(ctes)
        finals.append(f"SELECT {r} AS n_reps, user_id FROM {last}")
    sql = (
        "WITH "
        + ",\n".join(parts)
        + ",\nu AS (\n"
        + "\nUNION ALL\n".join(finals)
        + "\n)\nSELECT CAST(n_reps AS INT) AS n_reps,"
        " CAST(COUNT(*) AS BIGINT) AS n_matches,"
        " COUNT(DISTINCT user_id) AS n_users FROM u GROUP BY n_reps"
    )
    return prefix, group, (m, n), follower, f"{minutes} MINUTES", sql


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cep_group_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.operators.pattern import Pattern

    prefix, group, (m, n), follower, within, sql = gen_cep_group_query(
        seed
    )
    ev = table(spark, sf_dir, "events")
    sub = Pattern.begin(group[0])
    for t in group[1:]:
        sub = sub.followed_by(t)
    p = Pattern.begin(prefix[0]) if prefix else None
    p = p.followed_by(sub) if p else Pattern.begin(sub)
    got = (
        p.times(m, n)
        .followed_by(follower)
        .within(within)
        .match(ev)
        .groupBy("n_reps")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    assert_matches_oracle(got, sql, sf_dir)


def gen_trigger_query(seed: int):
    """Random CountTrigger(n) (+ optional CountEvictor(m)) configs
    over tumbling windows: random n, window size, eviction, and key
    column, rendered to fire_on_count on the Spark side and to the
    equivalent window-function SQL on the DuckDB side."""
    rng = random.Random(120_000 + seed)
    n = rng.choice([3, 5, 8])
    evict = rng.choice([None, 2, 4])
    hours = rng.choice([12, 24])
    key = rng.choice(["event_type", "user_id % 7"])
    key_alias = "k"
    frame = (
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if evict is None
        else f"ROWS BETWEEN {evict - 1} PRECEDING AND CURRENT ROW"
    )
    sql = f"""
WITH w AS (
  SELECT {key} AS {key_alias},
         time_bucket(INTERVAL '{hours} hours', ts) AS w_start,
         ts, event_id, value,
         ROW_NUMBER() OVER ord AS rn,
         COUNT(*) OVER (ord {frame}) AS n_elems,
         ROUND(SUM(value) OVER (ord {frame}), 2) AS sum_v
  FROM events
  WINDOW ord AS (PARTITION BY {key},
                              time_bucket(INTERVAL '{hours} hours', ts)
                 ORDER BY ts, event_id))
SELECT CAST({key_alias} AS VARCHAR) AS {key_alias},
       strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       CAST(rn / {n} AS INT) AS firing_seq,
       CAST(n_elems AS BIGINT) AS n_elems, sum_v
FROM w WHERE rn % {n} = 0
"""
    return n, evict, hours, key, sql


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_trigger_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import fire_on_count

    n, evict, hours, key, sql = gen_trigger_query(seed)
    ev = table(spark, sf_dir, "events")
    if key != "event_type":
        ev = ev.withColumn("__key", F.expr(key))
        key_col = "__key"
    else:
        key_col = "event_type"
    got = fire_on_count(
        ev, n, window=f"{hours} hours", evict_last=evict,
        key_col=key_col,
    ).select(
        F.col(key_col).cast("string").alias("k"),
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias(
            "w_start"
        ),
        "firing_seq",
        "n_elems",
        round_duck("sum_v", 2).alias("sum_v"),
    )
    assert_matches_oracle(got, sql, sf_dir)


def gen_continuous_trigger_query(seed: int):
    """Random ContinuousEventTimeTrigger (+ optional TimeEvictor)
    configs: random interval/window pairs (interval divides window,
    the epoch-aligned configuration) and eviction spans, rendered to
    fire_continuous and to the boundary-chain SQL."""
    rng = random.Random(130_000 + seed)
    win_h, ivl_h = rng.choice(
        [(24, 6), (24, 4), (24, 12), (12, 3), (12, 6)]
    )
    keep_h = rng.choice([None, ivl_h // 2 or 1, ivl_h])
    ivl_sec = ivl_h * 3600
    keep_sql = (
        ""
        if keep_h is None
        else f" AND e.ts > b.fire_at - INTERVAL {keep_h} HOUR"
    )
    sql = f"""
WITH e AS (
  SELECT event_type, time_bucket(INTERVAL '{win_h} hours', ts)
           AS w_start, ts, value
  FROM events),
f AS (
  SELECT event_type, w_start,
         w_start + INTERVAL {win_h} HOUR AS w_end, MIN(ts) AS first_ts
  FROM e GROUP BY 1, 2),
b AS (
  SELECT event_type, w_start, w_end,
         UNNEST(generate_series(
           LEAST(w_start + INTERVAL {ivl_h} HOUR *
             (CAST(FLOOR(epoch(first_ts - w_start) / {ivl_sec})
                   AS INT) + 1),
             w_end),
           w_end, INTERVAL {ivl_h} HOUR)) AS fire_at
  FROM f),
bounds AS (
  SELECT event_type, w_start, fire_at, 'early' AS firing
  FROM b WHERE fire_at < w_end
  UNION ALL
  SELECT event_type, w_start, w_end, 'final' FROM f)
SELECT b.event_type,
       strftime(b.w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       strftime(b.fire_at, '%Y-%m-%d %H:%M:%S') AS fire_at,
       b.firing, CAST(COUNT(*) AS BIGINT) AS n_elems,
       ROUND(SUM(e.value), 2) AS sum_v
FROM bounds b JOIN e ON e.event_type = b.event_type
 AND e.w_start = b.w_start AND e.ts <= b.fire_at{keep_sql}
GROUP BY 1, 2, 3, 4
"""
    return win_h, ivl_h, keep_h, sql


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_continuous_trigger_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import fire_continuous

    win_h, ivl_h, keep_h, sql = gen_continuous_trigger_query(seed)
    ev = table(spark, sf_dir, "events")
    got = fire_continuous(
        ev,
        f"{ivl_h} hours",
        f"{win_h} hours",
        evict_keep=None if keep_h is None else f"{keep_h} hours",
    ).select(
        "event_type",
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias(
            "w_start"
        ),
        F.date_format("fire_at", "yyyy-MM-dd HH:mm:ss").alias(
            "fire_at"
        ),
        "firing",
        "n_elems",
        round_duck("sum_v", 2).alias("sum_v"),
    )
    assert_matches_oracle(got, sql, sf_dir)


# ------------------------------------------- allowedLateness refinement


def gen_allowed_lateness_query(seed: int):
    """Random allowedLateness configs: window/delay/lateness drawn so
    all three row classes (on-time, late-admitted, dropped) occur
    under the deterministic jittered arrival (jitter spans 0..27
    minutes), rendered to fire_allowed_lateness and to the
    window-function SQL."""
    rng = random.Random(140_000 + seed)
    win = rng.choice(["1 hour", "2 hours", "30 minutes"])
    delay_m = rng.choice([2, 5, 8])
    late_m = rng.choice([5, 10, 15])
    sql = f"""
WITH ev AS (
  SELECT event_type, ts, value, event_id,
         ts + to_minutes(3 * CAST(event_id % 10 AS INT)) AS arrival
  FROM events),
o AS (
  SELECT *, time_bucket(INTERVAL '{win}', ts) AS w_start,
         time_bucket(INTERVAL '{win}', ts) + INTERVAL '{win}' AS w_end,
         MAX(ts) OVER (ORDER BY arrival, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)
           - INTERVAL {delay_m} MINUTE AS wm,
         (SELECT MAX(ts) FROM ev) - INTERVAL {delay_m} MINUTE
           AS final_wm
  FROM ev),
c AS (
  SELECT *, CASE
      WHEN wm IS NULL OR wm < w_end THEN 'on_time'
      WHEN wm < w_end + INTERVAL {late_m} MINUTE THEN 'late'
      ELSE 'dropped' END AS cls
  FROM o),
ot AS (
  SELECT event_type, w_start, CAST(COUNT(*) AS BIGINT) AS n_on,
         SUM(value) AS s_on, ANY_VALUE(final_wm >= w_end) AS fired
  FROM c WHERE cls = 'on_time'
  GROUP BY 1, 2),
lt AS (
  SELECT event_type, w_start,
         ROW_NUMBER() OVER pk AS fire_seq,
         SUM(value) OVER (pk ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cs
  FROM c WHERE cls = 'late'
  WINDOW pk AS (PARTITION BY event_type, w_start
                ORDER BY arrival, event_id))
SELECT event_type, strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       'on_time' AS firing, CAST(0 AS BIGINT) AS fire_seq,
       n_on AS n_elems, ROUND(s_on, 2) AS sum_v
FROM ot WHERE fired
UNION ALL
SELECT lt.event_type, strftime(lt.w_start, '%Y-%m-%d %H:%M:%S'),
       'late', fire_seq,
       COALESCE(ot.n_on, 0) + fire_seq,
       ROUND(COALESCE(ot.s_on, 0) + cs, 2)
FROM lt LEFT JOIN ot
  ON ot.event_type = lt.event_type AND ot.w_start = lt.w_start
"""
    return win, delay_m, late_m, sql


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_allowed_lateness_matches_oracle(spark, sf_dir, seed):
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import (
        fire_allowed_lateness,
    )

    win, delay_m, late_m, sql = gen_allowed_lateness_query(seed)
    ev = table(spark, sf_dir, "events").withColumn(
        "arrival",
        F.col("ts")
        + F.expr("make_dt_interval(0, 0, CAST(3*(event_id % 10) AS INT), 0)"),
    )
    got = fire_allowed_lateness(
        ev,
        window=win,
        delay=f"{delay_m} minutes",
        lateness=f"{late_m} minutes",
    ).select(
        "event_type",
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "firing",
        "fire_seq",
        "n_elems",
        round_duck("sum_v", 2).alias("sum_v"),
    )
    assert_matches_oracle(got, sql, sf_dir)
