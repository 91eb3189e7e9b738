"""Connected components over a pair/edge table — the clustering step
between near-duplicate PAIRS (operators/dedup.py emits them) and dedup
GROUPS (keep one representative per component).

Spark-first shape: Pregel-style min-label propagation expressed as plain
DataFrame joins — each round is `labels(node) := min(labels(node),
min(labels(neighbor)))`, one keyed shuffle per round, converging in
O(graph diameter) rounds. Near-dup graphs are unions of small cliques,
so the diameter is tiny (2-3 rounds typical). `localCheckpoint`
truncates lineage each round so plans stay O(1) deep; the driver only
sees a one-row convergence aggregate per round, never edge data.

At 1000-executor scale the same loop holds (each round is a shuffle by
node id); for adversarially long path graphs, switch to alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce"), which converges in O(log n) rounds with the same
join-groupBy primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node incident to an edge; component is
    the minimum node id reachable from the node.

    O(diameter) rounds — right for near-dup graphs (clique unions,
    diameter 2-3); WRONG answers if the diameter exceeds ``max_iter``
    (labels stop propagating mid-path). Shape-robust callers should use
    :func:`connected_components_auto`."""
    labels, _converged = _minlabel_components(edges, src, dst, max_iter)
    return labels


def _minlabel_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    materialized: bool = False,
) -> tuple[DataFrame, bool]:
    """Min-label propagation; returns (labels, converged).
    ``materialized=True`` skips the edge-list checkpoint (the caller
    already holds a localCheckpoint'd frame)."""
    # Materialize the edge list ONCE, before symmetrizing: upstream
    # `edges` is often an expensive similarity self-join, and both the
    # union's two branches and every propagation round would otherwise
    # recompute it from scratch.
    from pyspark.sql import Observation

    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not materialized:
        # eager=False (r16): the init-labels job right below is the
        # first action over the edge list and materializes the
        # checkpoint in-job — one scheduler round-trip fewer per call.
        # The edge content is deterministic (unlike fuzzyjoin's
        # monotonically_increasing_id dictionary, which must stay
        # eager), so lazy materialization cannot change the labels.
        base = base.localCheckpoint(eager=False)
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # (Measured dead end, r16: pre-partitioning sym by `a` behind a
    # localCheckpoint does NOT elide the per-round exchange — on Spark
    # 4.1 with AQE the checkpoint's LogicalRDD captures
    # UnknownPartitioning, eager or lazy — so it only added a shuffle.)
    # Labels only ever decrease, so sum(component) is a strictly
    # decreasing convergence measure: unchanged sum == fixpoint. Summed
    # as DECIMAL(38,0) — exact and overflow-free at any realistic scale
    # (a 64-bit long sum could wrap at billions of nodes with large ids
    # and alias two distinct states). The sum rides along as an
    # `observe()` metric on the SAME action that materializes the round's
    # localCheckpoint, so each round is exactly ONE Spark job — r2's
    # bench showed the separate convergence collect doubled the per-round
    # job count and dominated wall time at small scale.
    dec = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    # Round 1 folded into initialization: label(node) = min(node, Γ(node)).
    # r16: sym is symmetric, so Γ(node) = {b : (a=node, b) ∈ sym} and the
    # init is ONE groupBy over sym — least(a, min(b)) per group. The old
    # union(neighbors, self) form fed 2·|sym| rows into the init
    # exchange's partial aggregate; this feeds |sym| — half the init
    # bytes for identical labels, by definition of Γ.
    obs0 = Observation()
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
        .withColumnRenamed("a", "node")
        .observe(obs0, dec)
        .localCheckpoint()
    )
    prev = obs0.get["s"]
    converged = False
    for _ in range(max_iter):
        # Per-round join: sym is the static probe side (pre-partitioned
        # by `a`, zero Exchange, zero Sort); the node-sized labels table
        # is the hinted SHUFFLE_HASH build side — a checkpointed frame
        # has no size stats, so without the hint the planner fell back
        # to SortMergeJoin and re-sorted the EDGE-sized side each round
        # (r16; guide §3.1 — pick the strategy deliberately). Per-
        # partition build state is |nodes|/P — the standard bounded CC
        # shape at any scale.
        cand = sym.join(
            labels.hint("SHUFFLE_HASH"), sym["a"] == labels["node"]
        ).select(F.col("b").alias("node"), F.col("component"))
        obs = Observation()
        labels = (
            labels.union(cand)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .observe(obs, dec)
            .localCheckpoint()
        )
        cur = obs.get["s"]
        if cur == prev:
            converged = True
            break
        prev = cur
    return labels, converged


def component_sizes(components: DataFrame) -> DataFrame:
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical directed form u > v, self-loops dropped, deduped."""
    return (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    Converges in O(log n) rounds on ANY graph shape — the scale path for
    long-diameter graphs where min-label propagation
    (``connected_components``) needs O(diameter) rounds. Each half-round
    is one groupBy + one join, both keyed by node id; lineage truncated
    per round.

    large-star: every neighbor v > u re-links to m(u) = min(Γ(u) ∪ {u}).
    small-star: every neighbor v <= u (plus u itself) links to m(u).
    Fixpoint: the edge set is a collection of stars rooted at component
    minima; labels are then root(leaf)=center, root(center)=center.
    """
    cur = _canon(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint()
    for _ in range(max_iter):
        # --- large-star on the symmetric view ---
        sym = cur.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
            cur.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        m = sym.groupBy("a").agg(F.min("b").alias("mn")).select(
            "a", F.least(F.col("mn"), F.col("a")).alias("m")
        )
        ls = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        cur1 = _canon(ls).localCheckpoint()
        # --- small-star on the directed (u > v) view ---
        m2 = cur1.groupBy("u").agg(F.min("v").alias("m"))
        to_m = cur1.join(m2, "u").select(F.col("v").alias("a"), F.col("m").alias("b"))
        self_m = m2.select(F.col("u").alias("a"), F.col("m").alias("b"))
        nxt = _canon(to_m.union(self_m)).localCheckpoint()
        # fixpoint: canonical edge sets equal (cheap aggregate signature —
        # counts plus endpoint sums; exact equality then confirmed by anti-join)
        if nxt.count() == cur.count():
            if nxt.exceptAll(cur).limit(1).count() == 0:
                cur = nxt
                break
        cur = nxt
    roots = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return roots.union(centers).distinct()


def connected_components_auto(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    minlabel_rounds: int = 16,
    max_iter: int = 30,
) -> DataFrame:
    """Shape-adaptive connected components: min-label propagation with
    a bounded round budget, escaping to large-star/small-star when the
    graph turns out to have a long diameter.

    Why an escape hatch instead of an up-front edge/density threshold:
    measured at the sf1.0 replica's near-dup graph (1.1M edges over 20k
    nodes, E/N = 55, giant cliques) min-label converges in 2-3 rounds
    and beats star ~3.6 s vs ~4.8 s steady — raw edge COUNT does not
    predict the winner, and a density ratio cannot distinguish "many
    tiny cliques" (E/N ~ 1, min-label fine) from "one long path"
    (E/N ~ 1, min-label needs diameter rounds and returns WRONG labels
    at its iteration cap — 199,940 phantom components on a 200k-node
    path). Diameter is the decider and is unknowable cheaply, so: run
    min-label up to ``minlabel_rounds``; if the convergence observation
    has not fixed by then, rerun with star (O(log n) rounds on any
    shape). The default budget of 16 is calibrated by measurement: the
    sf0.01 near-dup graph (chained small cliques) genuinely needs 9-16
    rounds — an 8-round budget made it pay min-label AND star,
    tripling that leg — while larger-sf graphs converge in 2-3. Graphs
    inside the budget pay nothing extra; adversarial shapes pay the
    bounded wasted rounds and then terminate correctly.
    """
    # materialize the (often expensive) upstream edge list ONCE so an
    # escape to star never recomputes the candidate-generation stage.
    # eager=False (r16): min-label's init job is the first action and
    # materializes it in-job; by the time star could run, the blocks
    # exist — one scheduler round-trip fewer per call.
    base = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=False)
    labels, converged = _minlabel_components(
        base, "a", "b", minlabel_rounds, materialized=True
    )
    if converged:
        return labels
    return connected_components_star(base, "a", "b", max_iter=max_iter)


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """PageRank over the undirected edge graph (fixed iteration count).

    Same distributed shape as connected_components: one shuffle per
    round (contributions grouped by destination), lineage truncated per
    round. Every node here is incident to an edge, so there are no
    dangling-mass corrections. Scores are the centrality of a document
    inside its near-dup cluster — pipelines use it to pick canonical
    representatives or weight sampling.
    """
    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    degrees = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = degrees.count()
    if n_nodes == 0:
        return degrees.select(
            F.col("a").alias("node"), F.lit(0.0).alias("rank")
        )
    ranks = degrees.select(
        F.col("a").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint()
    teleport = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        contrib = (
            sym.join(degrees, "a")
            .join(ranks, sym["a"] == ranks["node"])
            .select(F.col("b").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg((F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank"))
            .localCheckpoint()
        )
    return ranks


def triangle_participation(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, n_triangles): how many triangles each node belongs to — the
    clustering-coefficient numerator, a standard density signal on
    near-dup graphs (clique-like clusters triangle-heavily; chains don't).

    Shape: canonicalize to lo < hi, then two equi-joins enumerate each
    triangle exactly once as (x < y < z); an explode + groupBy counts per
    node. Both joins key on node ids — shuffle-partitioned, no cross
    product. At web scale the standard refinement is degree-ordering
    (orient edges from low to high degree) to bound the join fan-out;
    near-dup graphs have bounded block sizes so the plain form holds.
    """
    c = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    e1 = c.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = c.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = c.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    nodes = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
