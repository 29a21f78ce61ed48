"""Fluent CEP pattern builder — the Flink ``Pattern.begin(..)
.followedBy(..).optional().notFollowedBy(..).within(..)`` API shape
(SURVEY.md §2 I8), compiled onto the relational CEP operators in
:mod:`operators.cep`.

A user porting a Flink CEP job writes the same pattern fluently and
gets a DataFrame plan: chains compile to keyed interval joins,
``optional()`` steps to a union over the 2^k optional-subset chains
(k <= 3, each branch a plain chain with typed NULLs for skipped
steps — the NO_SKIP both-branches semantics), ``notFollowedBy`` to
one LEFT ANTI join per branch span, quantifiers to the window-based
``match_times`` / ``match_one_or_more``, and after-match skip
strategies to the post-processing operators. Everything stays
declarative, so Catalyst still sees joins it can reorder and scans it
can prune — no per-event interpretation loop.

Supported shapes (validated, loud errors otherwise):

- linear chains of 2+ steps, any non-first subset of <= 3 marked
  ``optional()``; ``next_step()`` steps demand strict contiguity (no
  event of any type between them and the previous step — Flink's
  ``next()`` vs ``followedBy()``), compiled as one anti-join per
  strict pair;
- ``not_followed_by(type)`` between two MANDATORY steps (default
  first-to-last; Flink likewise forbids patterns ENDING in
  notFollowedBy);
- ``times(m, n)`` / ``one_or_more(max_gap)`` on the FIRST step with
  exactly one follower step (the quantified-burst shape the window
  operators implement);
- ``after_match_skip("no_skip" | "skip_to_next" | "skip_to_last" |
  "skip_past_last")`` on quantified patterns;
- ``select_strategy("any" | "first")`` on plain chains (+ negation):
  "any" is Flink ``followedByAny`` (every combination, the default
  here), "first" is Flink's ``followedBy`` (each step binds to the
  earliest qualifying event per prefix);
- **GroupPattern** (Flink ``Pattern.begin(subPattern)`` /
  ``followedBy(subPattern)``): a plain-chain sub-pattern embedded as
  one step. Unquantified groups splice inline (pure grouping
  syntax); ``times(m, n)`` ON THE GROUP repeats its step sequence
  m..n times with relaxed contiguity, lowered by unrolling to a
  bounded union of join chains (``n_reps`` + NULL-padded repetition
  columns). ``one_or_more()`` on a group (round 9) probes the
  maximal repetition depth actually present in the data (level
  emptiness is monotone under all-combinations contiguity) and
  delegates to the bounded unroll — batch-only, loud past the
  unroll's chained-step ceiling;
- **type hierarchies** (Flink ``subtype(SubEvent.class)``):
  ``with_hierarchy({abstract: [members...]})`` lets any step,
  negation, or until type name an abstract type (recursive
  resolution to ``event_type IN (...)``), and ``subtype(t)`` narrows
  the last step to a hierarchy descendant;
- **allowCombinations()** (Flink non-deterministic relaxed
  contiguity) on ``one_or_more()`` / ``times(m, n)``: every ordered
  subsequence of the looping step's events is a distinct match
  (full ``ids`` list in the output), lowered to the
  level-synchronous join expansion in ``match_combinations`` —
  batch-only, the match set is exponential in burst size;
- **where() row-level conditions** (Flink ``Pattern.where(
  SimpleCondition)``): a SQL boolean over the event's columns ANDed
  into the LAST step's type filter (repeated calls AND together);
  conditions restrict step BINDING only — a where-excluded event
  still breaks ``next_step()`` contiguity, Flink's any-event rule.
  Fixed chains with conditions STREAM on the join lowering (JVM
  residuals per step scan); quantified/negated shapes with
  conditions are batch-only — spell those as MATCH_RECOGNIZE
  DEFINEs on streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_framework_spark.operators.cep import (
    StepPred,
    anti_join_between,
    enforce_strict_contiguity,
    match_combinations,
    match_one_or_more,
    match_sequence_first,
    match_times,
    skip_past_last,
    skip_to_last,
    skip_to_next,
    union_skip_branches,
)

_SKIPS = ("no_skip", "skip_to_next", "skip_to_last", "skip_past_last")

def _interval_seconds(interval: str) -> float:
    """``"30 minutes"`` / ``"3 DAYS"`` → seconds, for handing a SQL
    interval string to the float-second Arrow state machines.
    (Distinct from ``sql._interval_seconds``, which parses the
    ``INTERVAL '3' DAY`` statement-dialect spelling.)"""
    import pandas as pd

    try:
        return pd.Timedelta(interval.lower()).total_seconds()
    except ValueError as e:
        raise ValueError(
            f"cannot parse interval {interval!r} (use '<n> <unit>', "
            "e.g. '30 minutes', '3 days')"
        ) from e


@dataclass
class _Step:
    event_type: str
    optional: bool = False
    strict: bool = False  # next() — no event between this and previous
    times: tuple[int, int] | None = None
    looping: bool = False  # one_or_more()
    one_or_more_gap: str | None = None
    until: str | None = None
    combinations: bool = False  # allowCombinations()
    where: str | None = None  # Pattern.where(SimpleCondition)
    # GroupPattern (Flink Pattern.begin(subPattern)): the member type
    # sequence of an embedded group; event_type is a display name only
    group: list[str] | None = None


@dataclass
class Pattern:
    """Build with :meth:`begin`, chain with the fluent methods, and
    run with :meth:`match`."""

    steps: list[_Step] = field(default_factory=list)
    negations: list[tuple[str, int | None, int | None]] = field(
        default_factory=list
    )
    horizon: str | None = None
    skip_strategy: str = "no_skip"
    select: str = "any"  # "any" = followedByAny, "first" = followedBy
    hierarchy: dict[str, list[str]] | None = None

    @classmethod
    def begin(cls, event_type: "str | Pattern") -> "Pattern":
        if isinstance(event_type, Pattern):
            return cls(steps=[event_type._as_group_step()])
        return cls(steps=[_Step(event_type)])

    def _as_group_step(self) -> _Step:
        """Validate this pattern as an embeddable GROUP (Flink
        ``Pattern.begin(subPattern)``): a plain chain of typed steps —
        no quantifiers, optionals, strict steps, negations, select
        'first', horizon, or skip strategy of its own (those belong to
        the OUTER pattern)."""
        if (
            self.negations
            or self.horizon is not None
            or self.skip_strategy != "no_skip"
            or self.select != "any"
            or self.hierarchy is not None
            or any(
                s.optional or s.strict or s.times or s.looping
                or s.one_or_more_gap or s.combinations or s.until
                or s.group or s.where
                for s in self.steps
            )
        ):
            raise ValueError(
                "a pattern GROUP must be a plain chain of typed steps "
                "— quantifiers, optionals, next_step, negations, "
                "where() conditions, select/skip strategies, within, "
                "and hierarchies belong on the OUTER pattern (and "
                "groups do not nest)"
            )
        if not self.steps:
            raise ValueError("an empty pattern cannot be a group")
        types = [s.event_type for s in self.steps]
        return _Step("(" + " ".join(types) + ")", group=types)

    # -- type hierarchy (Flink subtype()) ------------------------------
    def with_hierarchy(self, hierarchy: dict[str, list[str]]) -> "Pattern":
        """Declare a type-tag hierarchy: each key is an ABSTRACT event
        type standing for the set of its members (concrete tags or
        other abstract names — resolution is recursive). Any step,
        negation, or ``until`` type naming a key desugars to
        ``type_col IN (concrete members)`` — the relational spelling
        of Flink's class-hierarchy ``Pattern.subtype(SubEvent.class)``
        (the reference's subjects are case classes, so an abstract
        parent type IS a set of concrete record types; a type-tag
        column + this map is the flat-schema equivalent)."""
        for k, v in hierarchy.items():
            if isinstance(v, str) or not v:
                raise ValueError(
                    f"hierarchy[{k!r}] must be a non-empty list of "
                    "member type names"
                )
        self.hierarchy = dict(hierarchy)
        return self

    def subtype(self, event_type: str) -> "Pattern":
        """Flink ``.subtype(SubEvent.class)``: NARROW the last added
        step to ``event_type``, which must resolve to a subset of the
        step's current type set under the declared hierarchy."""
        if not self.steps:
            raise ValueError("subtype() needs a step to narrow")
        if self.steps[-1].group:
            raise ValueError(
                "subtype() applies to a typed step, not a group — "
                "narrow the member step inside the group pattern"
            )

        def as_set(t):
            e = self._expand(t)
            return {e} if isinstance(e, str) else set(e)

        cur = as_set(self.steps[-1].event_type)
        sub = as_set(event_type)
        if not sub <= cur:
            raise ValueError(
                f"subtype {event_type!r} resolves to {sorted(sub)}, "
                f"not a subset of the step's {sorted(cur)} — a "
                "subtype narrows, it cannot widen"
            )
        self.steps[-1].event_type = event_type
        return self

    def _expand(self, event_type: str, _seen: frozenset = frozenset()):
        """Abstract name → sorted tuple of concrete tags (identity for
        a tag not in the hierarchy)."""
        if self.hierarchy is None or event_type not in self.hierarchy:
            return event_type
        if event_type in _seen:
            raise ValueError(
                f"hierarchy cycle through {event_type!r}"
            )
        seen = _seen | {event_type}
        tags: set[str] = set()
        for m in self.hierarchy[event_type]:
            e = self._expand(m, seen)
            tags.update((e,) if isinstance(e, str) else e)
        return tuple(sorted(tags))

    # -- fluent chain -------------------------------------------------
    def followed_by(self, event_type: "str | Pattern") -> "Pattern":
        if isinstance(event_type, Pattern):
            self.steps.append(event_type._as_group_step())
        else:
            self.steps.append(_Step(event_type))
        return self

    def next_step(self, event_type: str) -> "Pattern":
        """Flink ``next()``: the step must be the key's IMMEDIATELY
        following event — strict contiguity, no event of any type
        between it and the previous step's match."""
        self.steps.append(_Step(event_type, strict=True))
        return self

    def optional(self) -> "Pattern":
        """Mark the LAST added step optional (Flink ``.optional()``)."""
        if len(self.steps) < 2:
            raise ValueError(
                "the first step anchors the match and cannot be optional"
            )
        if self.steps[-1].group:
            raise ValueError(
                "optional() on a GROUP is not supported — spell it as "
                "times(0, 1)-style branches by hand (union of the "
                "chain with and without the group's steps)"
            )
        self.steps[-1].optional = True
        return self

    def where(self, condition: str) -> "Pattern":
        """Flink ``Pattern.where(SimpleCondition)``: a row-level SQL
        boolean over the event's columns, AND-combined with the LAST
        step's type (repeated ``where`` calls AND together, like
        Flink). Streams everywhere (round 10): fixed chains compile
        conditions into each step's scan as JVM residuals on the join
        lowering; quantified / negated / forced-NFA shapes compile
        them into ONE stream pre-filter ahead of the Arrow state
        machines (see :meth:`_stream_where_prefilter` — drain-equal
        to batch because relaxed contiguity makes a condition-failing
        event indistinguishable from an irrelevant one, exactly how
        the batch operators apply conditions). The pre-filter needs
        each event type to bind at most one condition across the
        pattern; the ambiguous cases stay loud refusals."""
        if not self.steps:
            raise ValueError("where() needs a step")
        s = self.steps[-1]
        if s.group:
            raise ValueError(
                "where() on a GROUP is ambiguous — put the condition "
                "on the member step inside the group pattern"
            )
        s.where = (
            condition if s.where is None else f"({s.where}) AND ({condition})"
        )
        return self

    def not_followed_by(
        self,
        event_type: str,
        between: tuple[int, int] | None = None,
    ) -> "Pattern":
        """No ``event_type`` event strictly between the matched events
        of steps ``between`` (mandatory step indices; default
        first-to-last)."""
        i, j = between if between is not None else (None, None)
        self.negations.append((event_type, i, j))
        return self

    def times(self, n_min: int, n_max: int) -> "Pattern":
        """Quantify the LAST added step. On a TYPED step: must be the
        first step with exactly one ``followed_by`` after it (the
        consecutive-run window operators). On a GROUP step (Flink
        ``Pattern.begin(subPattern).times(m, n)``): the group repeats
        m..n times with relaxed contiguity, anywhere in the chain —
        lowered by unrolling to a bounded union of plain chains."""
        self.steps[-1].times = (n_min, n_max)
        return self

    def one_or_more(self, max_gap: str | None = None) -> "Pattern":
        """Unbounded looping on the LAST added step. With ``max_gap``:
        GREEDY maximal runs (successive repetitions within ``max_gap``
        of each other). Without it, the step must be followed by
        :meth:`allow_combinations` — the non-deterministic
        all-subsequences semantics, which has no gap notion.

        On a GROUP step (Flink ``Pattern.begin(subPattern)
        .oneOrMore()``): unbounded group repetition under relaxed
        contiguity, lowered by a DATA-ADAPTIVE unroll — the maximal
        repetition count inside one horizon is probed level by level
        (each level's exactly-r chain is a superset witness for
        r+1, so an empty level terminates the search), then the
        bounded ``times(1, r_max)`` union is built. Batch-only, and
        loud when the data's burst depth would push the unroll past
        the chained-step cap — the same refuse-instead-of-OOM
        contract as ``allow_combinations``. ``max_gap`` does not
        compose with groups (greedy gap runs are single-step run
        semantics)."""
        if self.steps[-1].group:
            if max_gap is not None:
                raise ValueError(
                    "one_or_more(max_gap) is the GREEDY single-step "
                    "run form — a GROUP repeats under relaxed "
                    "contiguity with no gap notion; call "
                    "one_or_more() without a gap"
                )
            self.steps[-1].looping = True
            return self
        self.steps[-1].looping = True
        self.steps[-1].one_or_more_gap = max_gap
        return self

    def allow_combinations(self) -> "Pattern":
        """Flink ``allowCombinations()`` — non-deterministic relaxed
        contiguity on the LAST step, which must be quantified
        (``times(m, n)`` or ``one_or_more()``): the loop binds to
        EVERY ordered subsequence of the step's events inside the
        horizon, each combination a distinct match (output carries
        the full ``ids`` list — combinations can share boundaries).
        Greedy ``one_or_more(max_gap)`` and combinations are
        different semantics — declare one_or_more() WITHOUT a gap
        for the combination form."""
        s = self.steps[-1]
        if s.group:
            raise ValueError(
                "allow_combinations() applies to a quantified typed "
                "step, not a group"
            )
        if not (s.times or s.looping):
            raise ValueError(
                "allow_combinations() needs the step quantified with "
                "times(m, n) or one_or_more() first"
            )
        if s.one_or_more_gap is not None:
            raise ValueError(
                "one_or_more(max_gap) is the GREEDY-runs form; "
                "combinations have no gap notion — declare "
                "one_or_more() without a gap"
            )
        if s.until is not None:
            raise ValueError(
                "until() composes with greedy one_or_more only"
            )
        s.combinations = True
        return self

    def until(self, event_type: str) -> "Pattern":
        """Flink ``oneOrMore().until(condition)``: an ``event_type``
        event stops the loop — runs cannot span one. Applies to the
        LAST added step, which must be quantified with
        :meth:`one_or_more`."""
        if (
            self.steps[-1].one_or_more_gap is None
            or self.steps[-1].combinations
        ):
            raise ValueError(
                "until() applies to a greedy one_or_more(max_gap) step"
            )
        self.steps[-1].until = event_type
        return self

    def within(self, horizon: str) -> "Pattern":
        self.horizon = horizon
        return self

    def after_match_skip(self, strategy: str) -> "Pattern":
        if strategy not in _SKIPS:
            raise ValueError(f"skip strategy must be one of {_SKIPS}")
        self.skip_strategy = strategy
        return self

    def select_strategy(self, select: str) -> "Pattern":
        """``"any"`` (default) is Flink ``followedByAny`` — every
        combination matches; ``"first"`` is Flink's ``followedBy`` —
        each step binds to the EARLIEST qualifying event per prefix.
        ``"first"`` supports plain chains + negation (no optionals —
        the skipping branch changes which event is "first" — and no
        next_step, whose immediate-event binding is a different,
        stricter rule)."""
        if select not in ("any", "first"):
            raise ValueError("select must be 'any' or 'first'")
        self.select = select
        return self

    # -- compile ------------------------------------------------------
    def match(
        self,
        events: DataFrame,
        key_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        id_col: str = "event_id",
    ) -> DataFrame:
        """Compile and run: returns the match frame (chain patterns:
        ``ts_i``/``id_i`` per step, NULL for skipped optionals;
        quantified patterns: ``ts_first``/``ts_last``/``n_reps``)."""
        if self.horizon is None:
            raise ValueError("pattern needs .within(horizon)")
        if any(s.group and s.times for s in self.steps):
            return self._match_group_times(
                events, key_col, ts_col, type_col, id_col
            )
        if any(s.group and s.looping for s in self.steps):
            return self._match_group_one_or_more(
                events, key_col, ts_col, type_col, id_col
            )
        if any(s.group for s in self.steps):
            return self._splice_groups().match(
                events, key_col, ts_col, type_col, id_col
            )
        quant = [s for s in self.steps if s.times or s.looping]
        if quant:
            return self._match_quantified(
                events, key_col, ts_col, type_col, id_col
            )
        return self._match_chain(events, key_col, ts_col, type_col, id_col)

    def _splice_groups(self) -> "Pattern":
        """Inline every UNQUANTIFIED group's member steps into the
        chain (an unrepeated group is pure grouping syntax). Negation
        ``between=`` indices and optional positions refer to the
        SPLICED layout — the one the output columns use."""
        flat: list[_Step] = []
        for s in self.steps:
            if s.group:
                flat.extend(_Step(t) for t in s.group)
            else:
                flat.append(s)
        return Pattern(
            steps=flat,
            negations=list(self.negations),
            horizon=self.horizon,
            skip_strategy=self.skip_strategy,
            select=self.select,
            hierarchy=self.hierarchy,
        )

    def _validate_group_times(self) -> list[int]:
        """Shared shape validation for the quantified-group compilers
        (bounded ``times`` unroll and the ``one_or_more`` adaptive
        probe): exactly one quantified group composed with PLAIN
        chain steps, no negation, select 'any', no after-match skip.
        Returns the quantified-group step indices."""
        gq = [i for i, s in enumerate(self.steps) if s.group and s.times]
        if len(gq) > 1 or (
            gq and any(s.group and s.looping for s in self.steps)
        ):
            raise ValueError(
                "one quantified group per pattern (two would union a "
                "product of unrollings)"
            )
        if any(
            s.optional or s.strict or (s.looping and not s.group)
            or (s.times and not s.group)
            for s in self.steps
        ):
            raise ValueError(
                "a quantified group composes with PLAIN chain steps "
                "only (no optional/next_step/other quantifiers)"
            )
        if self.negations:
            raise ValueError(
                "not_followed_by with a quantified group is ambiguous "
                "(step indices shift per repetition branch) — negate "
                "on a drained match frame instead"
            )
        if self.select != "any":
            raise ValueError(
                "quantified groups support select 'any' (followedByAny)"
            )
        if self.skip_strategy != "no_skip":
            raise ValueError(
                "after-match skip applies to single-step quantified "
                "patterns (group matches have no run frame to skip)"
            )
        return gq

    def _match_group_times(self, events, key_col, ts_col, type_col, id_col):
        """Flink GroupPattern repetition —
        ``begin(sub).times(m, n)`` (or a group anywhere in the chain):
        the group's step sequence repeats m..n times, relaxed
        contiguity between and inside repetitions, all combinations
        (``followedByAny``), every event within the horizon of the
        first. Lowered by UNROLLING: one plain join chain per
        repetition count r (prefix + members x r + suffix), each a
        :func:`match_sequence` over keyed interval joins, unioned with
        the r-branch's absent repetitions as typed NULLs — the same
        branch machinery as ``optional()``, so Catalyst sees only
        joins it can reorder.

        Output layout: ``n_reps`` plus ``ts_i``/``id_i`` for the
        MAXIMAL unroll — prefix steps first, then ``n_max`` x group
        positions, then suffix steps; a 2-rep match of a 3-rep-max
        group NULLs positions ``p + 2g .. p + 3g - 1``.

        Scale shape: (n - m + 1) chain branches, each <= 10 steps
        (loud cap — join count is the unroll length), unioned; no new
        join strategy, no cross joins."""
        from functools import reduce

        gq = self._validate_group_times()
        gi = gq[0]
        gstep = self.steps[gi]
        m, n = gstep.times
        g = len(gstep.group)
        if not (1 <= m <= n):
            raise ValueError("group times(m, n) needs 1 <= m <= n")
        prefix = [self._step_pred(s) for s in self.steps[:gi]]
        suffix = [self._step_pred(s) for s in self.steps[gi + 1:]]
        total = len(prefix) + n * g + len(suffix)
        if total > 10:
            raise ValueError(
                f"the maximal unroll is {total} chained steps; keep "
                "prefix + n_max * group + suffix <= 10"
            )
        if len(prefix) + m * g + len(suffix) < 2:
            raise ValueError("the shortest branch needs >= 2 steps")
        full = (
            prefix
            + [self._expand(t) for t in gstep.group] * n
            + suffix
        )
        p = len(prefix)
        branches = []
        for r in range(m, n + 1):
            skipped = list(range(p + r * g, p + n * g))
            b = union_skip_branches(
                events, full, [skipped], self.horizon,
                key_col, ts_col, type_col, id_col,
            ).withColumn("n_reps", F.lit(r))
            branches.append(b)
        return reduce(lambda a, b: a.unionByName(b), branches)

    def _match_group_one_or_more(
        self, events, key_col, ts_col, type_col, id_col
    ):
        """Flink ``begin(subPattern).oneOrMore()`` — UNBOUNDED group
        repetition, lowered data-adaptively (see :meth:`one_or_more`):
        probe the maximal repetition count r_max actually present
        inside one horizon (an exactly-r chain match always embeds in
        any exactly-(r+1) match under relaxed all-combinations
        contiguity, so level emptiness is monotone and the first
        empty level terminates), then delegate to the bounded
        ``times(1, r_max)`` unroll — same output layout, ``n_reps``
        plus the maximal ts_i/id_i positions.

        Loud cap: when the data still matches at the unroll's
        chained-step ceiling, raise instead of building an unbounded
        plan (tighten ``within`` or bound with ``times(m, n)`` — the
        :func:`operators.cep.match_combinations` contract). Probing
        costs one small-chain emptiness check per level, r_max + 1
        driver actions total."""
        import dataclasses as _dc

        gq = [
            i for i, s in enumerate(self.steps)
            if s.group and s.looping
        ]
        if len(gq) > 1:
            raise ValueError("one quantified group per pattern")
        gi = gq[0]
        gstep = self.steps[gi]
        g = len(gstep.group)
        p, s_len = gi, len(self.steps) - gi - 1

        def clone_with_times(n_min: int, n_max: int) -> "Pattern":
            steps = [
                _dc.replace(
                    st,
                    times=(n_min, n_max) if i == gi else st.times,
                    looping=False if i == gi else st.looping,
                    group=list(st.group) if st.group else None,
                )
                for i, st in enumerate(self.steps)
            ]
            return Pattern(
                steps=steps,
                negations=list(self.negations),
                horizon=self.horizon,
                skip_strategy=self.skip_strategy,
                select=self.select,
                hierarchy=self.hierarchy,
            )

        # validate the shape ONCE via the bounded compiler's checks
        # (negation/select/skip/other-quantifier refusals are shared)
        clone_with_times(1, 1)._validate_group_times()

        # the bounded unroll's plan-size ceiling; probing one level
        # past it is still a small plan, and a non-empty probe there
        # is the loud-refusal condition
        r_cap = (10 - p - s_len) // g
        if r_cap < 1:
            raise ValueError(
                "prefix + group + suffix already exceeds the 10-step "
                "unroll ceiling — shorten the chain"
            )
        r_max = 0
        for r in range(1, r_cap + 2):
            full = (
                [self._step_pred(st) for st in self.steps[:gi]]
                + [self._expand(t) for t in gstep.group] * r
                + [self._step_pred(st) for st in self.steps[gi + 1:]]
            )
            level = union_skip_branches(
                events, full, [[]], self.horizon,
                key_col, ts_col, type_col, id_col,
            )
            if level.isEmpty():
                break
            if r > r_cap:
                raise ValueError(
                    f"the data still matches at {r} group repetitions "
                    "— the unroll would exceed the 10-chained-step "
                    "ceiling; tighten within or bound with times(m, n)"
                )
            r_max = r
        if r_max == 0:
            # no match at any depth: the r=1 layout, empty
            return clone_with_times(1, 1)._match_group_times(
                events, key_col, ts_col, type_col, id_col
            ).limit(0)
        return clone_with_times(1, r_max)._match_group_times(
            events, key_col, ts_col, type_col, id_col
        )

    def _stream_where_conflict(self) -> str | None:
        """Reason the where() pre-filter CANNOT apply, or None.

        The Arrow state machines key transitions on the type tag, so
        conditions compile into one stream pre-filter (see
        :meth:`_stream_where_prefilter`) — sound only when each event
        type binds at most ONE condition across the whole pattern. A
        type carried by two steps with different conditions (or one
        conditioned and one not), or shared with a ``not_followed_by``
        / ``until()`` type, would make the filter eat events some
        other step still needs; those shapes stay loud refusals
        (fixed chains keep streaming them via the join lowering's
        per-step residuals)."""
        cond_by_type: dict[str, str] = {}
        plain: set[str] = set()
        for s in self.steps:
            if s.group:
                # group members are unconditioned steps: a type already
                # bound by a conditioned step is the same conflict as
                # the plain-step case below (currently re-checked after
                # the group-times desugar, but the invariant must hold
                # here too if the prefilter ever runs pre-desugar)
                for t in s.group:
                    if t in cond_by_type:
                        return (
                            f"where() cannot stream here: type {t!r} is "
                            "bound both conditioned and unconditioned — "
                            "the state-machine pre-filter could not keep "
                            "the unconditioned group step's events; run "
                            "match() on the lake"
                        )
                    plain.add(t)
                continue
            t = s.event_type
            if s.where:
                if t in plain or cond_by_type.get(t, s.where) != s.where:
                    return (
                        f"where() cannot stream here: type {t!r} is "
                        "bound by two steps with different conditions "
                        "— the state-machine pre-filter could not "
                        "tell which step an event fails; run match() "
                        "on the lake or spell the predicates as "
                        "MATCH_RECOGNIZE DEFINEs"
                    )
                cond_by_type[t] = s.where
            else:
                if t in cond_by_type:
                    return (
                        f"where() cannot stream here: type {t!r} is "
                        "bound both conditioned and unconditioned — "
                        "the state-machine pre-filter could not keep "
                        "the unconditioned step's events; run match() "
                        "on the lake"
                    )
                plain.add(t)
        for t, _i, _j in self.negations:
            if t in cond_by_type:
                return (
                    f"where() cannot stream here: negated type {t!r} "
                    "also carries a condition — the pre-filter would "
                    "hide events the absence check must see"
                )
        for s in self.steps:
            if s.until is not None and s.until in cond_by_type:
                return (
                    f"where() cannot stream here: until() type "
                    f"{s.until!r} also carries a condition"
                )
        return None

    def _stream_where_prefilter(self, src: DataFrame) -> DataFrame:
        """Compile every step's where() into ONE pre-filter for the
        Arrow state-machine lowerings (round 10 — closes the last
        non-env streaming refusal).

        Why this is drain-equal to batch BY CONSTRUCTION: the batch
        operators apply conditions by filtering each step's candidate
        events BEFORE any window/run/join logic
        (``operators.cep._type_pred`` — a failing event never enters
        the lag window, never counts as a repetition, never resets a
        gap, never qualifies as a follower), and the streaming
        machines only support RELAXED contiguity, under which an
        event that binds no step is simply ignored. So dropping
        condition-failing events of a conditioned type from the
        stream is exactly the batch semantics; every other type
        passes through untouched. Soundness of the type->condition
        mapping is checked by :meth:`_stream_where_conflict`."""
        conflict = self._stream_where_conflict()
        if conflict:
            raise ValueError(conflict)
        cond_by_type = {
            s.event_type: s.where
            for s in self.steps
            if s.where and not s.group
        }
        if not cond_by_type:
            return src
        keep = None
        for t, w in cond_by_type.items():
            c = (F.col("event_type") != F.lit(t)) | F.expr(w)
            keep = c if keep is None else keep & c
        return src.filter(keep)

    def match_stream(
        self,
        events: DataFrame,
        engine: str = "auto",
        watermark: str = "10 minutes",
        disorder_s: float = 0.0,
        key_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        id_col: str = "event_id",
        group_max_reps: int | None = None,
    ) -> DataFrame:
        """Streaming twin of :meth:`match` — ONE entry point that
        lowers the pattern onto the fastest streaming machine its
        semantics allow (the decision rule previously documented on
        ``streaming.stateful.funnel_conversions_join`` and chosen by
        hand):

        - **fixed chains** (every step a known type, no quantifiers /
          optionals / strict steps / negation, ``select 'any'``, no
          skip strategy) lower to
          :func:`streaming.stateful.sequence_matches_join` — cascaded
          watermarked stream-stream interval joins, all JVM, append
          mode (~530k rows/s measured vs ~27k for the Arrow state
          machine in bench.py);
        - **chains with ``not_followed_by``** lower to the Arrow
          :func:`streaming.stateful.sequence_matches` state machine
          with ``absent=`` (update mode) — streaming anti joins over
          an interval have no JVM spelling;
        - **``times(m, n)`` / ``one_or_more(gap)``** lower to the
          Arrow :func:`streaming.stateful.times_matches` /
          :func:`streaming.stateful.greedy_matches` keyed state
          machines (update mode).

        ``engine``: ``"auto"`` picks by the rule above; ``"join"``
        forces the join lowering (raises when the pattern is not a
        fixed chain); ``"nfa"`` forces the Arrow state machines (the
        equivalence tests route both ways). ``watermark`` drives the
        join path's state eviction; ``disorder_s`` is the NFA path's
        cross-batch event-time disorder allowance (the
        watermark-delay analogue). Output columns match the batch
        operators': ``ts_i``/``id_i`` per step for chains,
        ``ts_first``/``ts_last``/``n_reps`` for quantified patterns.

        Unsupported on streams (loud errors): optional()/next_step()/
        select 'first' (no streaming twin ships), after-match skip
        strategies (selection needs the full match set), and
        one_or_more().until()."""
        from flink_framework_spark.streaming.stateful import (
            greedy_matches,
            sequence_matches,
            sequence_matches_join,
            times_matches,
        )

        if engine not in ("auto", "join", "nfa"):
            raise ValueError(
                f"engine must be auto|join|nfa, not {engine!r}"
            )
        if self.horizon is None:
            raise ValueError("pattern needs .within(horizon)")
        has_where = any(s.where for s in self.steps)
        if has_where and (
            engine == "nfa"
            or self.negations
            or any(
                (s.times or s.looping) and not s.group
                for s in self.steps
            )
        ):
            # round 10: these shapes stream too — conditions compile
            # into ONE pre-filter ahead of the Arrow machines (see
            # _stream_where_prefilter); only type-ambiguous bindings
            # remain refusals, checked here so the error fires at the
            # entry point, not mid-plan
            conflict = self._stream_where_conflict()
            if conflict:
                raise ValueError(conflict)
        if any(s.group and s.looping for s in self.steps):
            # round 10: streams under a DECLARED repetition bound —
            # the batch path probes the data's maximal depth with
            # emptiness checks, which have no streaming form, so the
            # caller states the depth instead and the pattern streams
            # as the existing times(1, max_reps) join-lowered union.
            # Drain-equal to the batch adaptive unroll whenever the
            # declared bound covers the data (pinned); matches deeper
            # than the bound are NOT emitted — the bound is the
            # operator's state/latency contract, same as WITHIN.
            if group_max_reps is None:
                raise ValueError(
                    "one_or_more() on a GROUP streams only under a "
                    "declared repetition bound — the data-adaptive "
                    "unroll probes depth with emptiness checks, which "
                    "have no streaming form; pass "
                    "match_stream(..., group_max_reps=r) (drain-equal "
                    "to batch when r covers the data's maximal depth) "
                    "or bound the pattern itself with times(m, n)"
                )
            if group_max_reps < 1:
                raise ValueError("group_max_reps must be >= 1")
            bounded = Pattern(
                steps=[
                    _Step(
                        s.event_type,
                        times=(1, int(group_max_reps)),
                        group=s.group,
                    )
                    if (s.group and s.looping)
                    else s
                    for s in self.steps
                ],
                negations=list(self.negations),
                horizon=self.horizon,
                skip_strategy=self.skip_strategy,
                select=self.select,
                hierarchy=self.hierarchy,
            )
            return bounded.match_stream(
                events, engine, watermark, disorder_s,
                key_col, ts_col, type_col, id_col,
            )
        if any(s.group and s.times for s in self.steps):
            return self._match_stream_group_times(
                events, engine, watermark, disorder_s,
                key_col, ts_col, type_col, id_col,
            )
        if any(s.group for s in self.steps):
            # unquantified groups are grouping syntax — splice and
            # re-dispatch (a group of singletons keeps the chain
            # join-lowering eligible)
            return self._splice_groups().match_stream(
                events, engine, watermark, disorder_s,
                key_col, ts_col, type_col, id_col,
            )
        if self.skip_strategy != "no_skip":
            raise ValueError(
                "after-match skip strategies are batch-only (selection "
                "needs the full match set); run match() on the lake or "
                "apply skip_* to a drained match frame"
            )
        if (
            any(s.optional or s.strict for s in self.steps)
            or self.select != "any"
        ):
            raise ValueError(
                "optional()/next_step()/select 'first' have no "
                "streaming twin — supported: fixed chains, "
                "not_followed_by, times(), one_or_more()"
            )
        renames = {
            key_col: "user_id",
            ts_col: "ts",
            type_col: "event_type",
            id_col: "event_id",
        }
        # where() conditions reference the event's OTHER columns, so
        # they must survive the canonical-role projection (conditions
        # over a renamed role column should use the canonical name)
        extra = (
            [c for c in events.columns if c not in renames]
            if has_where
            else []
        )
        src = events.select(
            *[F.col(c).alias(a) for c, a in renames.items()], *extra
        )
        src = self._remap_stream_types(src)

        quant = [s for s in self.steps if s.times or s.looping]
        if has_where and (engine == "nfa" or self.negations or quant):
            # the Arrow machines take the pre-filtered stream; the
            # extra columns existed only for the conditions, so
            # project back to the canonical roles (the machines' state
            # schemas are role-only)
            src = self._stream_where_prefilter(src).select(
                "user_id", "ts", "event_type", "event_id"
            )
        if quant:
            if any(s.combinations for s in self.steps):
                raise ValueError(
                    "allowCombinations has no streaming twin (the "
                    "match set is exponential in burst size — no "
                    "bounded-state finalization story); run match() "
                    "on the lake"
                )
            if engine == "join":
                raise ValueError(
                    "quantified patterns need per-run state — no join "
                    "lowering exists; use engine='auto' or 'nfa'"
                )
            if self.negations:
                raise ValueError(
                    "not_followed_by on a quantified pattern has no "
                    "streaming twin (the batch compiler rejects the "
                    "combination too)"
                )
            if (
                len(self.steps) != 2
                or self.steps[1].times
                or self.steps[1].looping
            ):
                raise ValueError(
                    "streaming quantified patterns support exactly "
                    "begin(step).times(m, n)|one_or_more(gap)"
                    ".followed_by(follower).within(h)"
                )
            head, follower = self.steps
            horizon_s = _interval_seconds(self.horizon)
            if head.times:
                out = times_matches(
                    src,
                    n_min=head.times[0],
                    n_max=head.times[1],
                    horizon_s=horizon_s,
                    step=head.event_type,
                    then_step=follower.event_type,
                    disorder_s=disorder_s,
                )
            else:
                if head.until is not None:
                    raise ValueError(
                        "one_or_more().until() has no streaming twin"
                    )
                if head.one_or_more_gap is None:
                    raise ValueError(
                        "greedy one_or_more needs max_gap (or add "
                        "allow_combinations() for the batch-only "
                        "all-subsequences form)"
                    )
                # disorder_s > 0 routes to the reorder-buffered
                # driver (round 10 — closes the last asymmetry with
                # times_matches' allowance); 0 keeps the in-order
                # machine
                out = greedy_matches(
                    src,
                    max_gap_s=_interval_seconds(head.one_or_more_gap),
                    horizon_s=horizon_s,
                    step=head.event_type,
                    then_step=follower.event_type,
                    disorder_s=disorder_s,
                )
            return out.withColumnRenamed("user_id", key_col)

        steps = [s.event_type for s in self.steps]
        if self.negations:
            if engine == "join":
                raise ValueError(
                    "streaming interval ANTI joins do not exist — "
                    "negation runs on the Arrow state machine; use "
                    "engine='auto' or 'nfa'"
                )
            if len(self.negations) > 1:
                raise ValueError(
                    "streaming negation supports one "
                    "not_followed_by span"
                )
            abs_type, i, j = self.negations[0]
            between = (
                (0 if i is None else i, len(steps) - 1 if j is None else j)
            )
            out = sequence_matches(
                src,
                steps,
                horizon_s=_interval_seconds(self.horizon),
                disorder_s=disorder_s,
                absent=abs_type,
                between=between,
            )
        elif engine == "nfa":
            out = sequence_matches(
                src,
                steps,
                horizon_s=_interval_seconds(self.horizon),
                disorder_s=disorder_s,
            )
        else:
            # the join lowering takes the full per-step predicates:
            # post-remap the stream's tags ARE the steps' event_type
            # names (hierarchy tags rewritten), so the type side is
            # plain equality, and where() conditions ride along as
            # JVM residuals on each step's scan
            join_steps = [
                StepPred(types=s.event_type, where=s.where)
                if s.where
                else s.event_type
                for s in self.steps
            ]
            out = sequence_matches_join(
                src, join_steps, self.horizon, watermark=watermark
            )
        return out.withColumnRenamed("user_id", key_col)

    def stream_route_info(self) -> dict:
        """Explain how :meth:`match_stream` would execute this
        pattern under ``engine='auto'`` — the Pattern-API twin of
        :func:`streaming.mr.stream_route_info`:
        ``{"engine": "join" | "nfa" | "join-union" | "rejected",
        "reason": ..., "output_mode": ...}``. ``"join-union"`` is the
        quantified-group unroll (a union of join-lowered chains);
        ``"rejected"`` means the stream entry point refuses the
        shape. Agreement with the actual routing is test-pinned."""
        def rejected(reason):
            return {
                "engine": "rejected", "reason": reason,
                "output_mode": None,
            }

        if self.horizon is None:
            return rejected("pattern needs .within(horizon)")
        has_where = any(s.where for s in self.steps)
        quant_single = any(
            (s.times or s.looping) and not s.group for s in self.steps
        )
        if has_where and (self.negations or quant_single):
            # round 10: these stream via the pre-filter; only the
            # type-ambiguous bindings remain refusals
            conflict = self._stream_where_conflict()
            if conflict:
                return rejected(conflict)
        if any(s.group and s.looping for s in self.steps):
            return rejected(
                "one_or_more() on a group needs a declared bound to "
                "stream (the data-adaptive unroll's emptiness probes "
                "have no streaming form): pass match_stream(..., "
                "group_max_reps=r) to stream it as the times(1, r) "
                "join-lowered union, or bound the pattern with "
                "times(m, n)"
            )
        if any(s.group and s.times for s in self.steps):
            # mirror _match_stream_group_times's refusals so the
            # diagnostic never claims a route the entry point rejects
            if (
                len([s for s in self.steps if s.group and s.times]) > 1
            ):
                return rejected("one quantified group per pattern")
            if any(
                s.optional or s.strict or s.looping
                or (s.times and not s.group)
                for s in self.steps
            ):
                return rejected(
                    "a quantified group composes with plain chain "
                    "steps only"
                )
            if self.negations:
                return rejected(
                    "not_followed_by with a quantified group is "
                    "ambiguous"
                )
            if self.select != "any" or self.skip_strategy != "no_skip":
                return rejected(
                    "streaming quantified groups support select 'any' "
                    "with no after-match skip"
                )
            return {
                "engine": "join-union",
                "reason": "quantified-group unroll — one join-"
                "lowered fixed chain per repetition count, unioned",
                "output_mode": "append",
            }
        if self.skip_strategy != "no_skip":
            return rejected("after-match skip strategies are batch-only")
        if any(s.optional or s.strict for s in self.steps) or (
            self.select != "any"
        ):
            return rejected(
                "optional()/next_step()/select 'first' have no "
                "streaming twin"
            )
        if quant_single:
            head = self.steps[0]
            if any(s.combinations for s in self.steps):
                return rejected("allowCombinations has no streaming twin")
            if self.negations:
                return rejected(
                    "not_followed_by on a quantified pattern has no "
                    "streaming twin"
                )
            if (
                len(self.steps) != 2
                or self.steps[1].times
                or self.steps[1].looping
            ):
                return rejected(
                    "streaming quantified patterns support exactly "
                    "begin(step).times|one_or_more.followed_by(f)"
                )
            if head.looping and head.one_or_more_gap is None:
                return rejected("greedy one_or_more needs max_gap")
            if head.until is not None:
                return rejected("one_or_more().until() has no streaming twin")
            machine = (
                "times_matches" if head.times else "greedy_matches"
            )
            return {
                "engine": "nfa",
                "reason": f"quantified pattern — the {machine} Arrow "
                "keyed state machine"
                + (" (where() pre-filter ahead of the machine)"
                   if has_where else ""),
                "output_mode": "update",
            }
        if self.negations:
            if len(self.negations) > 1:
                return rejected(
                    "streaming negation supports one not_followed_by "
                    "span"
                )
            return {
                "engine": "nfa",
                "reason": "negation — streaming interval ANTI joins "
                "do not exist; the Arrow state machine carries "
                "absent-type state"
                + (" (where() pre-filter ahead of the machine)"
                   if has_where else ""),
                "output_mode": "update",
            }
        return {
            "engine": "join",
            "reason": "fixed chain — cascaded watermarked "
            "stream-stream interval joins, zero Python"
            + (" (where() residuals on the step scans)" if has_where
               else ""),
            "output_mode": "append",
        }

    def _match_stream_group_times(
        self, events, engine, watermark, disorder_s,
        key_col, ts_col, type_col, id_col,
    ) -> DataFrame:
        """Streaming twin of the quantified-group unroll: one
        per-repetition-count sub-pattern, each a plain FIXED CHAIN
        streamed through :meth:`match_stream` (join lowering under
        ``auto``/``join`` — relaxed contiguity needs no adjacency
        joins and no disjointness proof, every branch's matches are
        independent under all-combinations semantics), branch outputs
        aligned to the maximal ``ts_i``/``id_i`` layout with typed
        NULLs for absent repetitions plus ``n_reps``, unioned. Same
        columns as the batch unroll."""
        gq = [
            i for i, s in enumerate(self.steps) if s.group and s.times
        ]
        if len(gq) > 1:
            raise ValueError(
                "one quantified group per pattern (two would union a "
                "product of unrollings)"
            )
        if any(
            s.optional or s.strict or s.looping
            or (s.times and not s.group)
            for s in self.steps
        ):
            raise ValueError(
                "a quantified group composes with PLAIN chain steps "
                "only (no optional/next_step/other quantifiers)"
            )
        if self.negations:
            raise ValueError(
                "not_followed_by with a quantified group is ambiguous "
                "(step indices shift per repetition branch) — negate "
                "on a drained match frame instead"
            )
        if self.select != "any" or self.skip_strategy != "no_skip":
            raise ValueError(
                "streaming quantified groups support select 'any' "
                "with no after-match skip"
            )
        if engine == "nfa":
            raise ValueError(
                "the streaming group unroll unions its branches, and "
                "Spark refuses a union of update-mode Arrow state "
                "machines (multiple stateful operators) — use "
                "engine='auto'/'join' (append-mode join branches "
                "union fine)"
            )
        gi = gq[0]
        gstep = self.steps[gi]
        m, n = gstep.times
        g = len(gstep.group)
        if not (1 <= m <= n):
            raise ValueError("group times(m, n) needs 1 <= m <= n")
        prefix, suffix = self.steps[:gi], self.steps[gi + 1:]
        p = len(prefix)
        total = p + n * g + len(suffix)
        if total > 10:
            raise ValueError(
                f"the maximal unroll is {total} chained steps; keep "
                "prefix + n_max * group + suffix <= 10"
            )
        if p + m * g + len(suffix) < 2:
            raise ValueError("the shortest branch needs >= 2 steps")
        ts_type = events.schema[ts_col].dataType
        id_type = events.schema[id_col].dataType

        def clone(s: _Step) -> _Step:
            return _Step(s.event_type, where=s.where)

        out = None
        for r in range(m, n + 1):
            sub = Pattern(
                steps=(
                    [clone(s) for s in prefix]
                    + [_Step(t) for t in gstep.group] * r
                    + [clone(s) for s in suffix]
                ),
                horizon=self.horizon,
                hierarchy=self.hierarchy,
            )
            branch = sub.match_stream(
                events, engine, watermark, disorder_s,
                key_col, ts_col, type_col, id_col,
            )
            # branch positions: prefix 0..p-1 | reps p..p+r*g-1 |
            # suffix p+r*g.. — align suffix to p + n*g + i and NULL
            # the absent repetition positions
            cols = [F.col(key_col)]
            for pos in range(p + n * g + len(suffix)):
                if pos < p + r * g:
                    src_pos = pos
                elif pos < p + n * g:
                    src_pos = None
                else:
                    src_pos = pos - (n - r) * g
                if src_pos is None:
                    cols += [
                        F.lit(None).cast(ts_type).alias(f"ts_{pos}"),
                        F.lit(None).cast(id_type).alias(f"id_{pos}"),
                    ]
                else:
                    cols += [
                        F.col(f"ts_{src_pos}").alias(f"ts_{pos}"),
                        F.col(f"id_{src_pos}").alias(f"id_{pos}"),
                    ]
            cols.append(F.lit(r).alias("n_reps"))
            branch = branch.select(*cols)
            out = branch if out is None else out.unionByName(branch)
        return out

    def _step_pred(self, s: _Step):
        """A step's full event predicate for the relational
        operators: the expanded type (tag or tag set), wrapped in a
        :class:`StepPred` when the step carries a ``where()``."""
        e = self._expand(s.event_type)
        return StepPred(types=e, where=s.where) if s.where else e

    def _remap_stream_types(self, src: DataFrame) -> DataFrame:
        """Subtype desugaring for the STREAMING machines, which key
        their state transitions on concrete ``event_type`` equality:
        rewrite each tag inside a used abstract type's expansion to
        the abstract name itself. Sound only when the used types'
        expansions are pairwise disjoint (an overlapping tag would
        have to become two names at once) — overlap raises, pointing
        at the batch engine, whose per-step IN-filters support it."""
        used = [s.event_type for s in self.steps]
        used += [t for t, _i, _j in self.negations]
        used += [s.until for s in self.steps if s.until is not None]
        expansions = {
            t: self._expand(t)
            for t in dict.fromkeys(used)  # unique, order kept
        }
        abstract = {
            t: e for t, e in expansions.items() if not isinstance(e, str)
        }
        if not abstract:
            return src
        flat: dict[str, str] = {}
        for t, e in expansions.items():
            for tag in (e,) if isinstance(e, str) else e:
                if tag in flat and flat[tag] != t:
                    raise ValueError(
                        f"streaming subtype desugaring needs disjoint "
                        f"type sets: tag {tag!r} belongs to both "
                        f"{flat[tag]!r} and {t!r} — run match() on "
                        "the batch engine, whose per-step IN-filters "
                        "allow overlap"
                    )
                flat[tag] = t
        mapped = F.col("event_type")
        for t, e in abstract.items():
            mapped = F.when(
                F.col("event_type").isin(*e), F.lit(t)
            ).otherwise(mapped)
        return src.withColumn("event_type", mapped)

    def _match_quantified(self, events, key_col, ts_col, type_col, id_col):
        if (
            len(self.steps) != 2
            or self.steps[1].times
            or self.steps[1].looping
            or self.steps[0].optional
            or self.steps[1].optional
            or any(s.strict for s in self.steps)
            or self.negations
            or self.select != "any"
        ):
            raise ValueError(
                "quantified patterns support exactly the shape "
                "begin(step).times(m, n)|one_or_more(gap)"
                ".followed_by(follower).within(h) "
                "(optionally + after_match_skip)"
            )
        head, follower = self.steps
        if head.combinations:
            if self.skip_strategy != "no_skip":
                # composed spelling (round 9 — previously a documented
                # exclusion): the skip strategy prunes the drained
                # combination frame under the boundary-keyed
                # operators' (ts, event_id) contract — distinct
                # matches SHARING boundary events are genuinely
                # pruned (that is what a skip strategy means here),
                # the canonical-first kept; semantics pinned on
                # planted frames in tests/test_cep.py
                from flink_framework_spark.operators.cep import (
                    skip_combinations,
                )

                n_min, n_max = head.times if head.times else (1, None)
                return skip_combinations(
                    match_combinations(
                        events,
                        self._step_pred(head),
                        self._step_pred(follower),
                        self.horizon,
                        n_min=n_min,
                        n_max=n_max,
                        key_col=key_col,
                        ts_col=ts_col,
                        type_col=type_col,
                        id_col=id_col,
                    ),
                    self.skip_strategy,
                    key_col,
                )
            n_min, n_max = head.times if head.times else (1, None)
            return match_combinations(
                events,
                self._step_pred(head),
                self._step_pred(follower),
                self.horizon,
                n_min=n_min,
                n_max=n_max,
                key_col=key_col,
                ts_col=ts_col,
                type_col=type_col,
                id_col=id_col,
            )
        if head.looping and head.one_or_more_gap is None:
            raise ValueError(
                "greedy one_or_more needs max_gap (or add "
                "allow_combinations() for the all-subsequences form)"
            )
        if head.times:
            m = match_times(
                events,
                self._step_pred(head),
                self._step_pred(follower),
                head.times[0], head.times[1], self.horizon,
                key_col, ts_col, type_col, id_col,
            )
        else:
            m = match_one_or_more(
                events,
                self._step_pred(head),
                self._step_pred(follower),
                head.one_or_more_gap, self.horizon,
                key_col, ts_col, type_col, id_col,
                until=(
                    None if head.until is None
                    else self._expand(head.until)
                ),
            )
        if self.skip_strategy == "skip_to_next":
            return skip_to_next(m, key_col)
        if self.skip_strategy == "skip_to_last":
            return skip_to_last(m, key_col)
        if self.skip_strategy == "skip_past_last":
            return skip_past_last(m, key_col)
        return m

    def _match_chain(self, events, key_col, ts_col, type_col, id_col):
        n = len(self.steps)
        if n < 2:
            raise ValueError("a pattern needs at least 2 steps")
        if self.skip_strategy != "no_skip":
            raise ValueError(
                "after-match skip applies to quantified patterns "
                "(chain matches have no repetition structure to skip)"
            )
        opt = [i for i, s in enumerate(self.steps) if s.optional]
        if len(opt) > 3:
            raise ValueError(
                f"{len(opt)} optional steps would union {2 ** len(opt)} "
                "chains; keep <= 3"
            )
        mandatory = [i for i in range(n) if i not in opt]
        if len(mandatory) < 2:
            raise ValueError("need >= 2 mandatory steps")
        strict_pairs = []
        for i, s in enumerate(self.steps):
            if not s.strict:
                continue
            if i in opt or (i - 1) in opt:
                raise ValueError(
                    "next_step() needs a mandatory step preceded by a "
                    "mandatory step (the 'immediately before' event "
                    "would differ per optional branch)"
                )
            strict_pairs.append((i - 1, i))
        neg_spans = []
        for abs_type, i, j in self.negations:
            i = mandatory[0] if i is None else i
            j = mandatory[-1] if j is None else j
            if i in opt or j in opt or not (0 <= i < j < n):
                raise ValueError(
                    f"negation span ({i}, {j}) must be two mandatory "
                    "step indices in order"
                )
            neg_spans.append((abs_type, i, j))

        if self.select == "first":
            if opt or strict_pairs:
                raise ValueError(
                    "select 'first' supports plain chains + negation "
                    "(no optional()/next_step())"
                )
            out = match_sequence_first(
                events,
                [self._step_pred(s) for s in self.steps],
                self.horizon,
                key_col, ts_col, type_col, id_col,
            )
            for abs_type, i, j in neg_spans:
                out = anti_join_between(
                    out, events, f"ts_{i}", f"ts_{j}",
                    key_col, ts_col, type_col, self._expand(abs_type),
                )
            return out
        # one chain per optional subset — 2^k branches, unioned
        subsets = [
            skipped
            for r in range(len(opt) + 1)
            for skipped in combinations(opt, r)
        ]
        out = union_skip_branches(
            events,
            [self._step_pred(s) for s in self.steps],
            subsets,
            self.horizon,
            key_col, ts_col, type_col, id_col,
        )
        if strict_pairs:
            out = enforce_strict_contiguity(
                out, events, strict_pairs, key_col, ts_col
            )
        for abs_type, i, j in neg_spans:
            out = anti_join_between(
                out, events, f"ts_{i}", f"ts_{j}",
                key_col, ts_col, type_col, self._expand(abs_type),
            )
        return out
