"""Flink SQL statement dialect — run the statements a Flink SQL user
already has, unchanged (SURVEY.md §2 I1-I3/I8: the SQL spellings).

Flink exposes windows and CEP to SQL users through two constructs
Spark SQL does not parse:

- **FLIP-145 window TVFs** in FROM:
  ``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR
  [, offset]))``, ``HOP(TABLE t, DESCRIPTOR(ts), slide, size
  [, offset])``, ``CUMULATE(TABLE t, DESCRIPTOR(ts), step, size
  [, offset])``, ``SESSION(TABLE t [PARTITION BY k], DESCRIPTOR(ts),
  gap)``. Offsets shift the window grid (Spark ``startTime``; the
  CUMULATE assignment shifts timestamps in and bounds back out) and
  may be negative, like Flink's timezone-shift examples.
  Each relation is the source's columns plus ``window_start``,
  ``window_end``, ``window_time`` (= window_end - 1 ms, Flink's
  rowtime attribute of the window).
- **MATCH_RECOGNIZE** attached to a FROM table reference.
- **Temporal (versioned-table) joins**: ``JOIN dim FOR SYSTEM_TIME
  AS OF probe.ts [AS d] ON ...`` against an SCD2 relation carrying
  ``valid_from``/``valid_to`` — rewritten to the point-in-time
  containment predicate.

:func:`flink_sql` accepts a full statement, rewrites those constructs
onto this engine's operators (``F.window`` for tumble/hop, the
bounded-explode CUMULATE assignment, a gaps-and-islands session
assignment, :func:`operators.match_recognize.match_recognize` for the
NFA), registers each rewritten relation as a temp view, and hands the
remaining — now pure Spark SQL — statement to ``spark.sql``. The
surrounding projection/aggregation/join text therefore runs fully
JVM-side through Catalyst; only an embedded MATCH_RECOGNIZE crosses
into the per-key Arrow NFA, exactly like the operator form.

Scope notes: this is the batch entry point (the statements are
bounded-table semantics; the streaming twins of every window kind and
of MATCH_RECOGNIZE live in :mod:`streaming`). Rewrites are detected
outside string literals only; malformed TVF arguments raise loudly
rather than mis-assign, and the rejections that remain are semantic
(no Flink analogue), each pinned by a test: sub-second intervals,
offsets at or beyond their grid, PARTITION BY on non-SESSION TVFs.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.operators.match_recognize import match_recognize
from flink_framework_spark.operators.streaming_ops import cumulate_exploded

_INTERVAL_RE = re.compile(
    r"(?i)^INTERVAL\s*'(-?[\d.]+)'\s*(SECOND|MINUTE|HOUR|DAY)S?$"
)
_UNIT_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _interval_seconds(text: str, allow_negative: bool = False) -> float:
    m = _INTERVAL_RE.match(text.strip())
    if not m:
        raise ValueError(
            f"expected INTERVAL '<n>' <unit>, got {text.strip()!r}"
        )
    out = float(m.group(1)) * _UNIT_S[m.group(2).upper()]
    if out < 0 and not allow_negative:
        # only window OFFSETS may be negative (Flink's timezone-shift
        # examples); a negative size/slide/step/gap would silently
        # produce garbage windows (e.g. every-row sessions with
        # window_end < window_start)
        raise ValueError(
            f"negative interval {text.strip()!r} is only valid as a "
            "window offset"
        )
    return out


def _tvf_offset(args: list[str], idx: int, bound_s: float):
    """Optional FLIP-145 window offset argument: whole seconds (may
    be negative, like Flink's timezone-shift examples), required to
    be smaller in magnitude than the grid it shifts. Validated HERE
    for all three grid TVFs so CUMULATE cannot silently truncate a
    fractional offset that TUMBLE/HOP would reject."""
    if len(args) <= idx:
        return None
    off = _interval_seconds(args[idx], allow_negative=True)
    if off != int(off):
        raise ValueError(
            f"sub-second window offsets are out of scope "
            f"({args[idx].strip()!r})"
        )
    if abs(off) >= bound_s:
        raise ValueError(
            f"window offset {args[idx].strip()!r} must be smaller in "
            "magnitude than the window/slide it shifts"
        )
    return off


def _dur_str(seconds: float) -> str:
    """Seconds -> a Spark window duration string (whole seconds)."""
    if seconds != int(seconds):
        raise ValueError(
            f"sub-second window intervals are out of scope ({seconds}s)"
        )
    return f"{int(seconds)} seconds"


_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _scan_balanced(text: str, open_idx: int) -> int:
    """Index just past the ``)`` matching ``(`` at ``open_idx``,
    skipping string literals."""
    depth, i, n = 0, open_idx, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            m = _LIT_RE.match(text, i)
            if not m:
                raise ValueError("unterminated string literal")
            i = m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in statement")


def _split_top_level(args: str) -> list[str]:
    """Split on top-level commas, respecting parens and literals."""
    out, depth, cur, i, n = [], 0, [], 0, len(args)
    while i < n:
        ch = args[i]
        if ch == "'":
            m = _LIT_RE.match(args, i)
            cur.append(args[i : m.end()])
            i = m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


_TVF_HEAD_RE = re.compile(
    r"(?i)\bTABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\("
)
_SOURCE_RE = re.compile(
    r"(?is)^TABLE\s+([A-Za-z_]\w*)"
    r"(?:\s+PARTITION\s+BY\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*))?$"
)
_DESCRIPTOR_RE = re.compile(r"(?is)^DESCRIPTOR\s*\(\s*([A-Za-z_]\w*)\s*\)$")

_MR_RE = re.compile(r"(?i)\b([A-Za-z_]\w*)\s+MATCH_RECOGNIZE\s*\(")

_TEMPORAL_RE = re.compile(
    r"(?is)\b([A-Za-z_]\w*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"([A-Za-z_]\w*\.[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)([A-Za-z_]\w*))?\s+ON\b"
)


def _search_outside_literals(pattern: re.Pattern, text: str):
    """First match of ``pattern`` not inside a quoted string literal."""
    spans = [m.span() for m in _LIT_RE.finditer(text)]
    for m in pattern.finditer(text):
        if not any(a <= m.start() < b for a, b in spans):
            return m
    return None


def _reject_column_collisions(df: DataFrame, kind: str, names) -> None:
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"{kind} TVF source already has column(s) {clash} — the "
            "rewrite would silently overwrite them; rename them first"
        )


def _with_window_cols(df: DataFrame, kind: str, w) -> DataFrame:
    # window_start/window_end/window_time are the FLIP-145 columns.
    # The assignment STRUCT is also kept as ``window``: projected
    # fields lose Spark's watermark-to-window linkage, so a STREAMING
    # statement must GROUP BY ``window`` (then read window.start/end)
    # for append-mode finalization — batch statements group by
    # window_start/window_end exactly as in Flink.
    _reject_column_collisions(
        df, kind, ("window", "window_start", "window_end", "window_time")
    )
    return (
        df.withColumn("window", w)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .withColumn(
            "window_time", F.expr("window_end - INTERVAL 1 MILLISECOND")
        )
    )


def _session_assign(
    df: DataFrame, ts: str, keys: list[str], gap_s: float
) -> DataFrame:
    """FLIP-145 SESSION TVF as a relational gaps-and-islands
    assignment: rows whose event-time gap within a partition reaches
    ``gap`` start a new session; ``window_start`` = first ts,
    ``window_end`` = last ts + gap (the same merged-window bounds
    Spark's ``session_window`` and Flink's TVF produce)."""
    ob = (
        Window.partitionBy(*keys).orderBy(ts)
        if keys
        else Window.orderBy(ts)
    )
    # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike (a
    # plain double cast does not)
    gap_us = int(round(gap_s * 1e6))
    is_new = F.col("__prev").isNull() | (
        F.expr(f"timestampdiff(MICROSECOND, __prev, {ts})")
        >= F.lit(gap_us)
    )
    with_sid = (
        df.withColumn("__prev", F.lag(F.col(ts)).over(ob))
        .withColumn(
            "__sid",
            F.sum(is_new.cast("long")).over(
                ob.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("__prev")
    )
    per_sess = Window.partitionBy(*keys, "__sid")
    return (
        with_sid.withColumn("window_start", F.min(ts).over(per_sess))
        .withColumn(
            "window_end",
            F.max(ts).over(per_sess)
            + F.expr(f"INTERVAL {int(gap_s * 1000)} MILLISECOND"),
        )
        .withColumn(
            "window_time", F.expr("window_end - INTERVAL 1 MILLISECOND")
        )
        .drop("__sid")
    )


def _rewrite_tvfs(
    spark: SparkSession, stmt: str
) -> str:
    while True:
        m = _search_outside_literals(_TVF_HEAD_RE, stmt)
        if m is None:
            return stmt
        kind = m.group(1).upper()
        inner_open = stmt.index("(", m.end() - 1)  # the TVF's own (
        inner_end = _scan_balanced(stmt, inner_open)
        outer_end = _scan_balanced(stmt, stmt.index("(", m.start()))
        args = _split_top_level(stmt[inner_open + 1 : inner_end - 1])

        src = _SOURCE_RE.match(args[0])
        if not src:
            raise ValueError(
                f"first {kind} argument must be TABLE <name> "
                f"[PARTITION BY cols], got {args[0]!r}"
            )
        tbl, part = src.group(1), src.group(2)
        keys = (
            [k.strip() for k in part.split(",")] if part else []
        )
        if keys and kind != "SESSION":
            raise ValueError(f"PARTITION BY inside {kind} is SESSION-only")
        d = _DESCRIPTOR_RE.match(args[1])
        if not d:
            raise ValueError(
                f"second {kind} argument must be DESCRIPTOR(<col>), "
                f"got {args[1]!r}"
            )
        ts = d.group(1)
        df = spark.table(tbl)

        if kind == "TUMBLE":
            if len(args) not in (3, 4):
                raise ValueError(
                    "TUMBLE(TABLE t, DESCRIPTOR(ts), size [, offset])"
                )
            size = _interval_seconds(args[2])
            off = _tvf_offset(args, 3, size)
            w = (
                F.window(ts, _dur_str(size))
                if off is None
                else F.window(
                    # FLIP-145 offset == Spark startTime (both shift
                    # the epoch-aligned window grid); slide must be
                    # passed explicitly for the 4-arg form
                    ts, _dur_str(size), _dur_str(size), _dur_str(off)
                )
            )
            out = _with_window_cols(df, kind, w)
        elif kind == "HOP":
            if len(args) not in (4, 5):
                raise ValueError(
                    "HOP(TABLE t, DESCRIPTOR(ts), slide, size [, offset])"
                )
            slide = _interval_seconds(args[2])
            size = _interval_seconds(args[3])
            off = _tvf_offset(args, 4, slide)
            w = (
                F.window(ts, _dur_str(size), _dur_str(slide))
                if off is None
                else F.window(
                    ts, _dur_str(size), _dur_str(slide), _dur_str(off)
                )
            )
            out = _with_window_cols(df, kind, w)
        elif kind == "CUMULATE":
            if len(args) not in (4, 5):
                raise ValueError(
                    "CUMULATE(TABLE t, DESCRIPTOR(ts), step, size "
                    "[, offset])"
                )
            step = _interval_seconds(args[2])
            size = _interval_seconds(args[3])
            off = _tvf_offset(args, 4, size)
            if step % 60 or size % 60:
                raise ValueError(
                    "CUMULATE steps/sizes must be whole minutes here"
                )
            _reject_column_collisions(
                df, kind,
                ("w", "k", "end_ts", "window_start", "window_end",
                 "window_time")
                + (("ts",) if ts != "ts" else ()),
            )
            renamed = ts != "ts"
            base = df.withColumnRenamed(ts, "ts") if renamed else df
            if off:
                # offset shifts the window GRID: assign on shifted
                # timestamps, then shift the bounds back — rows keep
                # their original event times in the output
                base = base.withColumn(
                    "ts", F.expr(f"ts - INTERVAL {int(off)} SECOND")
                )
            e = cumulate_exploded(base, int(step // 60), int(size // 60))
            if off:
                e = e.withColumn(
                    "ts", F.expr(f"ts + INTERVAL {int(off)} SECOND")
                )
            if renamed:
                e = e.withColumnRenamed("ts", ts)
            shift = f" + INTERVAL {int(off)} SECOND" if off else ""
            out = e.select(
                *df.columns,
                F.expr(f"w.start{shift}").alias("window_start"),
                F.expr(f"end_ts{shift}").alias("window_end"),
            ).withColumn(
                "window_time",
                F.expr("window_end - INTERVAL 1 MILLISECOND"),
            )
        else:  # SESSION
            if len(args) != 3:
                raise ValueError(
                    "SESSION(TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap)"
                )
            _reject_column_collisions(
                df, kind,
                ("window_start", "window_end", "window_time",
                 "__prev", "__sid"),
            )
            if not keys:
                import warnings

                warnings.warn(
                    "SESSION TVF without PARTITION BY sessionizes over "
                    "a GLOBAL ordered window — a single partition at "
                    "scale. Fine for bounded oracle-side statements; "
                    "any production use must PARTITION BY a key.",
                    stacklevel=2,
                )
            gap = _interval_seconds(args[2])
            out = _session_assign(df, ts, keys, gap)

        view = "__flink_tvf_" + hashlib.md5(
            stmt[m.start() : outer_end].encode()
        ).hexdigest()[:10]
        out.createOrReplaceTempView(view)
        stmt = stmt[: m.start()] + view + stmt[outer_end:]


_ON_END_RE = re.compile(
    r"(?i)\b(JOIN|INNER|LEFT|RIGHT|FULL|CROSS|NATURAL|WHERE|GROUP|"
    r"ORDER|HAVING|LIMIT|UNION|EXCEPT|INTERSECT|WINDOW|QUALIFY)\b"
)


def _on_clause_end(stmt: str, start: int) -> int:
    """Index just past the ON condition starting at ``start``: scan to
    the next top-level clause keyword, a ``)`` closing an enclosing
    subquery, or end of statement — skipping literals and balanced
    parens."""
    i, n = start, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch == "'":
            lit = _LIT_RE.match(stmt, i)
            if not lit:
                raise ValueError("unterminated string literal")
            i = lit.end()
            continue
        if ch == "(":
            i = _scan_balanced(stmt, i)
            continue
        if ch == ")":  # closes an enclosing subquery
            return i
        m = _ON_END_RE.match(stmt, i)
        if m and (i == 0 or not (stmt[i - 1].isalnum() or stmt[i - 1] == "_")):
            return i
        i += 1
    return n


def _rewrite_temporal_joins(spark: SparkSession, stmt: str) -> str:
    """Flink versioned-table join: ``JOIN dim FOR SYSTEM_TIME AS OF
    probe.ts [AS d] ON <cond>``. The dimension must be an SCD2
    versioned relation carrying ``valid_from`` / ``valid_to``
    (half-open; NULL valid_to = current version — the shape
    ``operators.scd.scd2_build`` produces). The clause rewrites to a
    plain join with the point-in-time containment predicate ANDed
    around the PARENTHESIZED original condition (a top-level OR must
    not escape the time filter), which Catalyst plans like any other
    range-bounded join; a probe row before the key's first version
    drops (Flink's event-time temporal-join semantics)."""
    while True:
        m = _search_outside_literals(_TEMPORAL_RE, stmt)
        if m is None:
            return stmt
        dim, probe_ts, alias = m.group(1), m.group(2), m.group(3)
        q = alias or dim
        dim_df = spark.table(dim)
        if dim_df.isStreaming:
            # the build side is a LIVE changelog stream — lower onto
            # the versioned-keyed-state operator instead of a
            # containment rewrite (which only works for static SCD2)
            stmt = _lower_stream_temporal(
                spark, stmt, m, dim, dim_df, probe_ts, alias
            )
            continue
        cols = set(dim_df.columns)
        if not {"valid_from", "valid_to"} <= cols:
            raise ValueError(
                f"FOR SYSTEM_TIME AS OF: {dim!r} is not a versioned "
                "relation — it needs valid_from/valid_to columns "
                "(build one with operators.scd.scd2_build)"
            )
        head = dim + (f" AS {alias}" if alias else "")
        pred = (
            f"({probe_ts} >= {q}.valid_from AND "
            f"({q}.valid_to IS NULL OR {probe_ts} < {q}.valid_to))"
        )
        cond_end = _on_clause_end(stmt, m.end())
        cond = stmt[m.end() : cond_end].strip()
        if not cond:
            raise ValueError(
                "FOR SYSTEM_TIME AS OF: empty ON condition"
            )
        stmt = (
            f"{stmt[: m.start()]}{head} ON {pred} AND ({cond}) "
            f"{stmt[cond_end:]}"
        )


_PROBE_RE = re.compile(
    r"(?is)([A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?((?!LEFT\b|INNER\b|JOIN\b)[A-Za-z_]\w*))?"
    r"\s+(LEFT\s+(?:OUTER\s+)?|INNER\s+)?JOIN\s*$"
)
_EQ_RE = re.compile(
    r"\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*"
)
_SQL_WM_KEY = "spark.watermarkDelayMs"


def _lower_stream_temporal(
    spark: SparkSession,
    stmt: str,
    m: re.Match,
    dim: str,
    dim_df: DataFrame,
    probe_ts: str,
    alias: str | None,
) -> str:
    """``probe JOIN dim FOR SYSTEM_TIME AS OF probe.ts ON k = k``
    where ``dim`` is a STREAM: Flink's temporal table-function join.
    Lowers onto
    :func:`streaming.temporal.temporal_join_changelog_stream`
    (versioned keyed state; facts gated on the global watermark) and
    splices the result in as a view under the probe's alias. The dim
    stream declares its event time by being watermarked on it (the
    Flink versioned-table contract); the ON clause must be a
    conjunction of key equalities with matching column names."""
    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    pm = _PROBE_RE.search(stmt[: m.start()])
    if pm is None:
        raise ValueError(
            "FOR SYSTEM_TIME AS OF (stream dim): cannot find the "
            "probe relation before JOIN — subqueries are not "
            "supported here, name a registered stream"
        )
    probe, p_alias, how_kw = pm.group(1), pm.group(2), pm.group(3) or ""
    how = "left" if how_kw.strip().upper().startswith("LEFT") else "inner"
    fq = p_alias or probe
    dq = alias or dim
    ts_alias, _, ts_col = probe_ts.partition(".")
    if ts_alias != fq:
        raise ValueError(
            f"FOR SYSTEM_TIME AS OF {probe_ts}: the AS OF time must "
            f"come from the probe side {fq!r}"
        )
    cond_end = _on_clause_end(stmt, m.end())
    cond = stmt[m.end() : cond_end].strip()
    keys: list[str] = []
    for part in re.split(r"(?i)\s+AND\s+", cond):
        em = _EQ_RE.fullmatch(part)
        if em is None:
            raise ValueError(
                "FOR SYSTEM_TIME AS OF (stream dim): ON must be a "
                f"conjunction of alias.col = alias.col equalities, "
                f"got {part!r}"
            )
        a1, c1, a2, c2 = em.groups()
        if {a1, a2} != {fq, dq}:
            raise ValueError(
                f"ON term {part!r} must join {fq!r} to {dq!r}"
            )
        fc, dc = (c1, c2) if a1 == fq else (c2, c1)
        if fc != dc:
            raise ValueError(
                f"ON term {part!r}: the stream temporal join needs "
                "identically-named key columns — alias one side first"
            )
        keys.append(fc)
    facts_df = spark.table(probe)
    if not facts_df.isStreaming:
        raise ValueError(
            f"FOR SYSTEM_TIME AS OF: dim {dim!r} is a stream but "
            f"probe {probe!r} is batch — a changelog build side "
            "needs a streaming probe (use scd2_build + a batch "
            "temporal join for batch probes)"
        )
    dim_wm = [
        f.name for f in dim_df.schema if _SQL_WM_KEY in (f.metadata or {})
    ]
    if len(dim_wm) != 1:
        raise ValueError(
            f"stream dim {dim!r} must be watermarked on exactly its "
            f"event-time column (found watermark on {dim_wm or 'no'} "
            "column) — that is how the versioned table declares its "
            "version time"
        )
    out = temporal_join_changelog_stream(
        facts_df,
        dim_df,
        on=keys,
        fact_ts=ts_col,
        dim_ts=dim_wm[0],
        how=how,
    )
    view = "__flink_tj_" + hashlib.md5(
        stmt[pm.start(1) : cond_end].encode()
    ).hexdigest()[:10]
    out.createOrReplaceTempView(view)
    # splice under the probe's alias: the enriched view carries the
    # probe payload AND the dim attributes, so downstream references
    # go through the probe alias (or unqualified)
    return f"{stmt[: pm.start(1)]}{view} AS {fq} {stmt[cond_end:]}"


def _rewrite_match_recognize(
    spark: SparkSession, stmt: str, id_col: str = "event_id"
) -> str:
    while True:
        m = _search_outside_literals(_MR_RE, stmt)
        if m is None:
            return stmt
        tbl = m.group(1)
        open_idx = stmt.index("(", m.end() - 1)
        end = _scan_balanced(stmt, open_idx)
        clause = stmt[open_idx + 1 : end - 1]
        out = match_recognize(spark.table(tbl), clause, id_col=id_col)
        view = "__flink_mr_" + hashlib.md5(
            stmt[m.start() : end].encode()
        ).hexdigest()[:10]
        out.createOrReplaceTempView(view)
        stmt = stmt[: m.start()] + view + stmt[end:]


def flink_sql(
    spark: SparkSession,
    statement: str,
    tables: dict[str, DataFrame] | None = None,
    mr_id_col: str = "event_id",
) -> DataFrame:
    """Run a Flink SQL statement: FLIP-145 window TVFs, embedded
    MATCH_RECOGNIZE, and ``FOR SYSTEM_TIME AS OF`` temporal joins
    (against SCD2 valid_from/valid_to relations) are rewritten onto
    this engine's operators; the rest of the statement is Spark SQL
    and goes through Catalyst untouched.

    ``tables`` registers DataFrames as temp views first (a minimal
    stand-in for Flink's catalog; views already registered on the
    session work too).

    ``mr_id_col`` is the deterministic tie-break column an embedded
    MATCH_RECOGNIZE appends to its ORDER BY (a table without the
    default ``event_id`` must either carry a second ORDER BY key in
    the clause or name its id column here)."""
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    stmt = _rewrite_tvfs(spark, statement)
    stmt = _rewrite_temporal_joins(spark, stmt)
    stmt = _rewrite_match_recognize(spark, stmt, id_col=mr_id_col)
    return spark.sql(stmt)
