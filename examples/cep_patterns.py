"""CEP pattern-matching demo: the Flink CEP API surface, Spark-first.

Runs a tour of the fluent ``Pattern`` builder over the events table —
sequences, strict contiguity, optional steps, negation, quantifiers,
skip strategies, first-vs-any selection — then replays the funnel
pattern as a streaming state machine (``applyInPandasWithState``) and
checks it agrees with the batch run.

Every pattern compiles to a declarative DataFrame plan (keyed
interval joins, windows, anti-joins), so Catalyst optimizes it like
any other query — there is no per-event interpreter.

Run:  python examples/cep_patterns.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_framework_spark.io import table  # noqa: E402
from flink_framework_spark.operators.pattern import Pattern  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="cep-patterns-demo")
    ev = table(spark, sf_dir, "events")

    def show(label: str, pattern: Pattern) -> None:
        n = pattern.match(ev).count()
        print(f"{label:<58} {n:>8} matches")

    base = lambda: Pattern.begin("view").followed_by("click").followed_by(
        "purchase"
    )

    print(f"== CEP pattern tour over {sf_dir}/events ==")
    show(
        "view ->followedByAny click -> purchase (12h)",
        base().within("12 HOURS"),
    )
    show(
        "same, followedBy FIRST-occurrence selection",
        base().within("12 HOURS").select_strategy("first"),
    )
    show(
        "view ->next(click) [strict contiguity] -> purchase",
        Pattern.begin("view")
        .next_step("click")
        .followed_by("purchase")
        .within("12 HOURS"),
    )
    show(
        "view -> click.optional() -> purchase (both branches)",
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("purchase")
        .within("12 HOURS"),
    )
    show(
        "view -> purchase, notFollowedBy(click) between",
        Pattern.begin("view")
        .followed_by("purchase")
        .not_followed_by("click")
        .within("12 HOURS"),
    )
    show(
        "click.times(2,3) -> purchase (12h)",
        Pattern.begin("click")
        .times(2, 3)
        .followed_by("purchase")
        .within("12 HOURS"),
    )
    show(
        "  + after-match SKIP_PAST_LAST_EVENT",
        Pattern.begin("click")
        .times(2, 3)
        .followed_by("purchase")
        .within("12 HOURS")
        .after_match_skip("skip_past_last"),
    )
    show(
        "click.oneOrMore(gap 24h).greedy -> purchase (7d)",
        Pattern.begin("click")
        .one_or_more("24 HOURS")
        .followed_by("purchase")
        .within("7 DAYS"),
    )
    show(
        "  + until(error) loop stop",
        Pattern.begin("click")
        .one_or_more("24 HOURS")
        .until("error")
        .followed_by("purchase")
        .within("7 DAYS"),
    )
    # -- round-8 API surface: groups / subtype / where / combinations
    show(
        "GroupPattern: (view click).times(1,2) -> purchase (48h)",
        Pattern.begin(Pattern.begin("view").followed_by("click"))
        .times(1, 2)
        .followed_by("purchase")
        .within("48 HOURS"),
    )
    show(
        "subtype(): activity>interaction -> conversion (30m)",
        Pattern.begin("activity")
        .with_hierarchy(
            {
                "interaction": ["view", "click"],
                "conversion": ["purchase", "signup"],
                "activity": ["interaction", "conversion"],
            }
        )
        .subtype("interaction")
        .followed_by("conversion")
        .within("30 MINUTES"),
    )
    show(
        "where(): cheap view -> big purchase (12h)",
        Pattern.begin("view")
        .where("value < 20")
        .followed_by("purchase")
        .where("value >= 80")
        .within("12 HOURS"),
    )
    show(
        "allowCombinations(): click subsequences -> purchase (6h)",
        Pattern.begin("click")
        .one_or_more()
        .allow_combinations()
        .followed_by("purchase")
        .within("6 HOURS"),
    )

    # -- the same funnel as a streaming state machine ----------------
    from flink_framework_spark.operators.cep import match_sequence
    from flink_framework_spark.streaming.stateful import sequence_matches
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    steps = ["view", "click", "purchase"]
    batch_n = match_sequence(ev, steps, "12 HOURS").count()
    sdf = read_events_stream(spark, sf_dir)
    stream_n = run_to_memory(
        sequence_matches(sdf, steps, 12 * 3600),
        query_name="cep_demo_stream",
        output_mode="update",
    ).count()
    agree = "AGREE" if batch_n == stream_n else "DISAGREE"
    print(
        f"\nstreaming twin (applyInPandasWithState NFA): "
        f"batch={batch_n} stream={stream_n} -> {agree}"
    )
    assert batch_n == stream_n

    # -- round-10 surface: conditioned QUANTIFIERS stream too --------
    # where() on a times()/oneOrMore/negated shape used to refuse on
    # match_stream; the conditions now compile into one pre-filter
    # ahead of the Arrow state machine (drain-equal to batch because
    # relaxed contiguity makes a condition-failing event
    # indistinguishable from an irrelevant one).
    cond = (
        Pattern.begin("click")
        .where("value >= 50")
        .times(2, 3)
        .followed_by("purchase")
        .within("12 HOURS")
    )
    cbatch = cond.match(ev).count()
    cstream = run_to_memory(
        cond.match_stream(read_events_stream(spark, sf_dir)),
        query_name="cep_demo_cond_stream",
        output_mode="update",
    ).count()
    print(
        f"conditioned times(2,3) stream (where() pre-filter): "
        f"batch={cbatch} stream={cstream} -> "
        f"{'AGREE' if cbatch == cstream else 'DISAGREE'}"
    )
    assert cbatch == cstream
    spark.stop()


if __name__ == "__main__":
    main()
