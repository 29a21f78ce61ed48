"""coreness (distributed h-index iteration) vs sequential peeling."""

from __future__ import annotations

import random

from flink_framework_spark.operators.iterative import coreness


def _peel(edges):
    """Classic O(n^2) min-degree peeling — the textbook core-number
    algorithm, as the independent reference implementation."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in adj.items()}
    core: dict[int, int] = {}
    k = 0
    alive = set(adj)
    while alive:
        v = min(alive, key=lambda n: (deg[n], n))
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for w in adj[v]:
            if w in alive:
                deg[w] -= 1
    return core


def _run(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {r.node: (r.degree, r.core) for r in coreness(df).collect()}


def test_coreness_known_graph(spark):
    # 5-clique with a pendant node hanging off node 0, plus an
    # isolated edge: clique is the 4-core, pendant and the pair are 1
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = clique + [(0, 10), (20, 21)]
    out = _run(spark, edges)
    for n in range(5):
        assert out[n][1] == 4
    assert out[10] == (1, 1)
    assert out[20] == (1, 1) and out[21] == (1, 1)


def test_coreness_matches_peeling_random(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 28
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.12 + 0.05 * trial
        ]
        if not edges:
            continue
        expect = _peel(edges)
        got = _run(spark, edges)
        assert {k: v[1] for k, v in got.items()} == expect
        # degree column is the true degree
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        assert {k: v[0] for k, v in got.items()} == {
            k: len(s) for k, s in adj.items()
        }


def test_coreness_nonconverged_returns_monotone_bound(spark):
    """With max_iter too small for the graph, coreness warns and
    returns the monotone upper-bound state instead of raising — every
    returned core number must be >= the true core number."""
    import warnings

    # a long path needs ~len/2 h-index rounds to converge
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "u long, v long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = {r.node: r.core for r in coreness(df, max_iter=2).collect()}
    assert any("upper-bound" in str(w.message) for w in caught)
    true = _peel(edges)
    assert all(out[n] >= true[n] for n in true)
    # and with enough rounds the same graph reaches the exact fixpoint
    exact = {r.node: r.core for r in coreness(df, max_iter=50).collect()}
    assert exact == true
