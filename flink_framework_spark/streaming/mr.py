"""Streaming MATCH_RECOGNIZE — the true stream form of the SQL
row-pattern clause (Flink runs MATCH_RECOGNIZE on streams natively;
SURVEY.md §2 I8 [F]).

Semantics: a match can only be FINAL when no future row can change
it. Under greedy quantifiers the match anchored at row *a* depends on
exactly the rows in ``[a.ts, a.ts + WITHIN]`` (consumption is
contiguous from the anchor and bounded by the window), so once the
watermark passes ``a.ts + WITHIN`` the anchor's outcome — match or
no-match, and its full greedy extent — is decided. The twin therefore
buffers rows per key, scans finalizable anchors in order with the
SAME shared core as the batch operator
(:func:`operators.match_recognize.scan_rows`), emits their matches,
and drops everything before the first still-open anchor; an
event-time timer re-fires the key when the watermark will close that
anchor, so quiet keys drain without new input. ``WITHIN`` is
mandatory here — it is what bounds both finalization latency and
state (window × per-key rate), the same reason Flink requires
bounded patterns for state cleanup.

MATCH_NUMBER() continuity across micro-batches is kept in state, so
the emitted stream is row-for-row the batch result."""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_framework_spark.operators.match_recognize import (
    parse_match_recognize,
    prepare_flags,
    rows_to_frame,
    scan_rows,
)
from flink_framework_spark.streaming.epoch import (
    epoch_s_to_timestamps,
    ts_series_to_epoch_s,
)

_STATE_ARRAY = {
    "boolean": "array<boolean>",
    "bigint": "array<bigint>",
    "int": "array<int>",
    "double": "array<double>",
    "float": "array<float>",
    "string": "array<string>",
    # timestamps ride as epoch seconds (micros-exact at current epochs)
    "timestamp": "array<double>",
    "timestamp_ntz": "array<double>",
}


def match_recognize_stream(
    events: DataFrame,
    clause: str,
    id_col: str = "event_id",
) -> DataFrame:
    """Run a MATCH_RECOGNIZE clause on a watermarked stream. Output is
    append-final per row (emitted in ``update`` mode): each match row
    is emitted exactly once, when the watermark closes its anchor's
    WITHIN window."""
    spec = parse_match_recognize(clause)
    if len(spec.partition_cols) > 1:
        raise ValueError(
            "streaming MATCH_RECOGNIZE keys state on ONE partition "
            "column — pre-combine the keys into a single column "
            "(e.g. a struct or concat) or run the clause on the batch "
            "engine, which supports multi-column PARTITION BY directly"
        )
    if spec.rows == "all":
        raise ValueError(
            "ALL ROWS PER MATCH is batch-only here (per-row streaming "
            "emission with running measures has no bounded-state "
            "finalization story); use ONE ROW PER MATCH on streams"
        )
    if spec.within_s is None:
        raise ValueError(
            "streaming MATCH_RECOGNIZE requires WITHIN — it bounds both "
            "state and finalization latency"
        )
    from flink_framework_spark.operators.match_recognize import (
        _compile_nav_define,
        _rewrite_define,
    )

    # same detector the batch rewrite uses: literals are split out
    # (navigation text inside a quoted string is not navigation) and
    # PREV(x, 0) folds to the plain column (no cross-batch hazard) —
    # only a REAL lag/lead requirement rejects
    navs: dict[str, tuple[str, str, int]] = {}
    for v, expr in spec.defines.items():
        if expr is not None:
            _rewrite_define(expr, spec.variables, navs, v)
    if navs:
        raise ValueError(
            "PREV()/NEXT() in DEFINE is batch-only here: flags are "
            "precomputed per micro-batch, and physical navigation "
            "across batch boundaries under late data would read the "
            "wrong neighbor — run the clause on the batch engine"
        )
    # FIRST/LAST navigation DEFINEs are buffer-safe on streams: every
    # navigated position is at or after the match anchor, and the
    # state buffer keeps everything from the first open anchor on.
    # A PREV/NEXT call INSIDE one of these conditions is not (it can
    # reach before the anchor, into rows already dropped) — reject it
    # with the same batch-only message.
    nav_defines = {}
    for v, nexpr in spec.nav_defines.items():
        fn, _ncols, physical = _compile_nav_define(
            v, nexpr, spec.elements
        )
        if physical:
            raise ValueError(
                "PREV()/NEXT() in DEFINE is batch-only here: physical "
                "navigation can reach before the match anchor, into "
                "rows the stream state has already dropped — run the "
                "clause on the batch engine"
            )
        nav_defines[v] = fn
    flagged, order_by, ts_col, out_schema = prepare_flags(
        events, spec, id_col
    )
    types = {f.name: f.dataType.simpleString() for f in flagged.schema}
    carried = [c for c in flagged.columns if c != spec.partition_by]
    state_fields = []
    for c in carried:
        t = types[c]
        if t not in _STATE_ARRAY:
            raise ValueError(
                f"column {c!r} of type {t} is not supported in streaming "
                "MATCH_RECOGNIZE state"
            )
        state_fields.append(f"{c} {_STATE_ARRAY[t]}")
    state_schema = ", ".join(state_fields + ["mno bigint"])
    is_ts = {c: types[c].startswith("timestamp") for c in carried}

    elements = [
        (e.var, e.n_min, e.n_max, e.reluctant,
         spec.agg_defines.get(e.var))
        for e in spec.elements
    ]
    measures = [
        (m.name, m.func, m.var, m.col, m.final, m.offset)
        for m in spec.measures
    ]
    names = [spec.partition_by] + [m.name for m in spec.measures]
    var_names = spec.variables
    subsets = dict(spec.subsets)
    skip, within_s, key_col = spec.skip, spec.within_s, spec.partition_by
    skip_var = spec.skip_var

    def _mr_fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_value,) = key
        frames = []
        if state.exists:
            *arrays, mno = state.get
            cols = {}
            for c, arr in zip(carried, arrays):
                if is_ts[c]:
                    cols[c] = epoch_s_to_timestamps(arr)
                else:
                    cols[c] = list(arr)
            if cols[carried[0]]:
                frames.append(pd.DataFrame(cols))
        else:
            mno = 0
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    frames.append(pdf[carried])
        if not frames:
            state.remove()
            return
        buf = (
            pd.concat(frames, ignore_index=True)
            .sort_values(order_by, kind="mergesort")
            .reset_index(drop=True)
        )
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        out_rows, resume, mno = scan_rows(
            buf,
            key_value,
            elements=elements,
            measures=measures,
            skip=skip,
            within_s=within_s,
            var_names=var_names,
            ts_col=ts_col,
            anchor_bound_s=wm_s,
            match_no_start=mno,
            subsets=subsets,
            skip_var=skip_var,
            nav_defines=nav_defines or None,
        )
        rest = buf.iloc[resume:]
        if len(rest):
            arrays = []
            for c in carried:
                if is_ts[c]:
                    arrays.append(ts_series_to_epoch_s(rest[c]))
                else:
                    arrays.append(rest[c].tolist())
            state.update((*arrays, mno))
            first_ts = ts_series_to_epoch_s(rest[ts_col])[0]
            # fire when the watermark closes the earliest open anchor
            # (clamped past the current watermark — a timer at or below
            # it would never fire)
            state.setTimeoutTimestamp(
                max(
                    round((first_ts + within_s) * 1000) + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif mno:
            # keep MATCH_NUMBER continuity for future rows on this key
            state.update((*[[] for _ in carried], mno))
        else:
            state.remove()
        if out_rows:
            yield rows_to_frame(out_rows, names)

    return (
        flagged.groupBy(key_col)
        .applyInPandasWithState(
            _mr_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
