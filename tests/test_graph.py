"""Connected-components operator invariants (oracle parity is covered by
test_oracle_queries.py's recursive-CTE comparison)."""

from __future__ import annotations

import numpy as np

from external_benchmarks_spark.operators.graph import (
    component_sizes,
    connected_components,
    connected_components_star,
    pagerank,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    return {r.node: r.component for r in connected_components(edges).collect()}


def test_two_triangles_and_bridge(spark):
    # {1,2,3} clique, {10,11,12} clique, bridge 3-10 merges them; {20,21} apart
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)]
    comp = _cc(spark, pairs)
    assert {comp[n] for n in (1, 2, 3, 10, 11, 12)} == {1}
    assert comp[20] == comp[21] == 20


def test_path_graph_converges(spark):
    # worst case for min-label propagation: a long path
    n = 33
    comp = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_star_cc_equals_simple_cc(spark):
    """large-star/small-star must produce identical components to
    min-label propagation on assorted topologies."""
    cases = [
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)],
        [(i, i + 1) for i in range(25)],  # long path (star CC's raison d'etre)
        [(i, (i * 7) % 20) for i in range(1, 20) if i != (i * 7) % 20],
        [(0, 1)],
        [(5, 5), (5, 6)],  # self-loop tolerated
    ]
    for pairs in cases:
        edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
        simple = {r.node: r.component for r in connected_components(edges).collect()}
        star = {r.node: r.component for r in connected_components_star(edges).collect()}
        # star drops isolated self-loop-only nodes the same way the
        # simple CC keeps them; compare on the shared node set
        for n in set(simple) & set(star):
            assert simple[n] == star[n], (pairs, n)
        # every true (non-self-loop) edge endpoint must be labeled by star
        real_nodes = {n for a, b in pairs if a != b for n in (a, b)}
        assert real_nodes <= set(star), pairs


def test_pagerank_matches_numpy_power_iteration(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.node: r.rank for r in pagerank(edges, n_iter=10).collect()}

    # reference: dense power iteration with identical update rule
    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a]][idx[b]] = adj[idx[b]][idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (adj.T @ (r / deg))
    for node, i in idx.items():
        assert abs(got[node] - r[i]) < 1e-9, (node, got[node], r[i])
    # ranks form a probability-ish distribution (sums to ~1 with no dangling)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_edges_endpoints_share_component(spark):
    pairs = [(i, (i * 7) % 20) for i in range(1, 20) if i != (i * 7) % 20]
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    for a, b in pairs:
        assert comp[a] == comp[b], (a, b)
    sizes = {
        r.component: r.n_members
        for r in component_sizes(connected_components(edges)).collect()
    }
    assert sum(sizes.values()) == len(comp)


def test_triangle_participation_known_graph(spark):
    """K4 has 4 triangles; every node is in exactly C(3,2)=3 of them. A
    pendant vertex attached to the K4 is in none."""
    from external_benchmarks_spark.operators.graph import triangle_participation

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], ["id_a", "id_b"])
    got = {r.node: r.n_triangles for r in triangle_participation(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_auto_cc_escapes_to_star_on_long_path(spark):
    """A path graph's diameter exceeds the bounded min-label rounds;
    auto must escape to star and return CORRECT labels (min-label at a
    round cap returns phantom components)."""
    from pyspark.sql import functions as F

    from external_benchmarks_spark.operators.graph import (
        connected_components_auto,
    )

    path = spark.range(500).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components_auto(path, minlabel_rounds=4)
    comps = {r.component for r in out.collect()}
    assert comps == {0}  # one path, rooted at the minimum node


def test_auto_cc_stays_minlabel_on_cliques(spark):
    """Clique unions (the near-dup shape) converge inside the round
    budget; auto's answer equals plain min-label's."""
    from external_benchmarks_spark.operators.graph import (
        connected_components,
        connected_components_auto,
    )

    rows = []
    for base in (0, 100, 200):
        ids = [base + i for i in range(6)]
        rows += [(a, b) for a in ids for b in ids if a < b]
    edges = spark.createDataFrame(rows, "id_a bigint, id_b bigint")
    auto = {(r.node, r.component) for r in connected_components_auto(edges).collect()}
    plain = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert auto == plain
    assert {c for _, c in auto} == {0, 100, 200}
