"""Shared epoch-seconds <-> timestamp codec for streaming state.

``applyInPandasWithState`` state schemas carry event times as
``double`` epoch seconds (micros-exact at current epochs). Batch
equivalence tests require the save/restore round-trip to be
bit-identical wherever it appears — the streaming MATCH_RECOGNIZE
twin (:mod:`streaming.mr`) and the OVER-window twin
(:mod:`streaming.stateful`) must agree on it — so the conversion
lives here once instead of as per-module copies that could drift.

Convention: tz-naive timestamps are wall-clock values interpreted as
UTC on the number line (the same convention the state-twin tests pin
under foreign-timezone sessions); restore rounds to whole
microseconds before building the nanosecond Timestamp.
"""

from __future__ import annotations

import pandas as pd


def ts_series_to_epoch_s(series: pd.Series) -> list[float]:
    """Timestamp column -> epoch-seconds floats (micros-exact),
    normalized through ns regardless of the Arrow-side unit (us/ns)."""
    return [
        v / 1e9
        for v in series.to_numpy(dtype="datetime64[ns]")
        .astype("int64")
        .tolist()
    ]


def epoch_s_to_timestamps(values) -> list[pd.Timestamp]:
    """Epoch-seconds floats -> tz-naive Timestamps, rounded to whole
    microseconds (the state schema's precision floor)."""
    return [pd.Timestamp(round(s * 1e6) * 1000) for s in values]
