"""PageRank (operators.iterative.pagerank): reference-implementation
agreement, mass conservation with dangling nodes, determinism."""

from __future__ import annotations

import pytest

from flink_framework_spark.operators.iterative import pagerank


def _numpy_pagerank(edge_list, n_iter=5, d=0.85):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, b in set(edge_list):
        out.setdefault(a, set()).add(b)
    r = [1.0 / n] * n
    for _ in range(n_iter):
        nxt = [0.0] * n
        dang = sum(r[idx[v]] for v in nodes if v not in out)
        for a, targets in out.items():
            share = r[idx[a]] / len(targets)
            for b in targets:
                nxt[idx[b]] += share
        r = [(1 - d) / n + d * (nxt[i] + dang / n) for i in range(n)]
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def ring_with_hub(spark):
    # 8-node ring plus a hub connected to everyone (bidirectional)
    edges = []
    for i in range(8):
        edges.append((i, (i + 1) % 8))
        edges.append(((i + 1) % 8, i))
        edges.append((i, 99))
        edges.append((99, i))
    return edges, spark.createDataFrame(edges, ["src", "dst"])


def test_pagerank_matches_reference(spark, ring_with_hub):
    edges, df = ring_with_hub
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    want = _numpy_pagerank(edges, n_iter=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-5)
    # the hub outranks every ring node
    assert got[99] == max(got.values())


def test_pagerank_dangling_mass_conserved(spark):
    # a -> b, b dangling: with redistribution, total mass stays ~1
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
    assert got[2] > got[1]  # sink receives mass every round


def test_pagerank_deterministic_across_partitioning(spark, ring_with_hub):
    _, df = ring_with_hub
    a = sorted(map(tuple, pagerank(df.repartition(2), n_iter=4).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(13), n_iter=4).collect()))
    assert a == b


def test_pagerank_empty_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df)
