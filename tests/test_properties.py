"""Property-based tests (SURVEY.md §5.2): the reference's own quality
invariants — sampling preserves distributions, embedding norms are fixed
by construction — plus algebraic invariants of the dedup/session
operators. Hypothesis generates the data; every Spark-side check is
deterministic (fixed seeds, integer-exact hashing)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["apple", "banana", "cherry", "delta", "echo", "fox", "golf", "hotel"]
texts = st.lists(st.sampled_from(WORDS), min_size=1, max_size=20).map(" ".join)


@PROP
@given(st.lists(texts, min_size=2, max_size=25))
def test_exact_dedup_partitions_the_table(spark, docs):
    """Dedup groups are a partition: counts sum to the table size and each
    keeper is the minimum id of its hash group."""
    from external_benchmarks_spark.operators.dedup import exact_dedup_groups

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = exact_dedup_groups(df).collect()
    assert sum(r.dup_count for r in got) == len(docs)
    want_keepers = {}
    for i, t in enumerate(docs):
        want_keepers[t] = min(want_keepers.get(t, i), i)
    assert {r.keeper_id for r in got} == set(want_keepers.values())


@PROP
@given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=15), st.randoms())
def test_minhash_and_simhash_are_set_semantics(spark, words, rnd):
    """Signatures depend on the token SET: permuting and duplicating
    tokens must not change MinHash or SimHash."""
    from external_benchmarks_spark.operators.dedup import minhash_signature, simhash

    original = " ".join(words)
    shuffled = list(words) + [words[0]]  # duplicate one token...
    rnd.shuffle(shuffled)  # ...and permute
    df = spark.createDataFrame(
        [(0, original), (1, " ".join(shuffled))], ["doc_id", "text"]
    )
    mh = {r.doc_id: tuple(v for k, v in r.asDict().items() if k.startswith("mh"))
          for r in minhash_signature(df, num_hashes=8).collect()}
    assert mh[0] == mh[1]
    sh = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert sh[0] == sh[1]
    assert 0 <= sh[0] < (1 << 32)


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_conserves_events(spark, events):
    """Session stats are a partition of each user's events."""
    from external_benchmarks_spark.operators.sessions import sessionize

    rows = [
        (str(u), int(ts) * 60_000_000, i) for i, (u, ts) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_us", "event_id"])
    got = sessionize(df, user_col="user_id", ts_col="ts_us").collect()
    per_user: dict[str, int] = {}
    for u, _ts, _i in rows:
        per_user[u] = per_user.get(u, 0) + 1
    assert {r.user_id: r.total_events for r in got} == per_user
    for r in got:
        assert 1 <= r.n_sessions <= r.total_events
        assert r.max_session_events <= r.total_events


@PROP
@given(st.integers(0, 2**31 - 1))
def test_deterministic_sample_preserves_distribution(spark, seed_offset):
    """The reference's own acceptance invariant (summary_report.md:42-46):
    uniform sampling preserves categorical shares within tolerance."""
    from external_benchmarks_spark.operators.sampling import uniform_sample

    n = 4000
    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.xxhash64(F.col("id") + seed_offset), F.lit(4))).alias("cat")
    )
    sample = uniform_sample(df, fraction=0.5, seed=42)
    full = {r.cat: r["count"] / n for r in df.groupBy("cat").count().collect()}
    n_s = sample.count()
    assert n_s > 0
    samp = {
        r.cat: r["count"] / n_s for r in sample.groupBy("cat").count().collect()
    }
    for cat, share in full.items():
        assert abs(samp.get(cat, 0.0) - share) < 0.1


@PROP
@given(st.lists(texts, min_size=1, max_size=10))
def test_embedding_norm_invariant(spark, titles):
    """Per-field blocks are unit-norm, so ||embedding|| = sqrt(n_fields)
    (the reference's norm 2.646 = sqrt(7) invariant,
    benchmark_10k/README.md:70)."""
    from external_benchmarks_spark.functions.vector import l2_norm
    from external_benchmarks_spark.pipeline.embedding import embed_fields

    df = spark.createDataFrame(
        [(i, t, t[::-1]) for i, t in enumerate(titles)], ["id", "title", "description"]
    )
    out = embed_fields(df, fields=("title", "description"), dim=8)
    norms = [r.n for r in out.select(l2_norm("embedding").alias("n")).collect()]
    for n in norms:
        assert abs(n - 2.0**0.5) < 1e-6


def test_dup_span_stats_exact_counts(spark):
    """Hand-built corpus where every span count is known: cross-doc dup,
    within-doc repeat, and a doc too short to have any 8-token span."""
    from external_benchmarks_spark.operators.dedup import dup_span_stats

    rot = "p q r s t u v w"
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),      # 2 spans; first shared with doc 2
            (2, "a b c d e f g h x"),      # 2 spans; first shared with doc 1
            (3, "a b"),                    # too short: zero spans
            (4, f"{rot} {rot}"),           # 9 spans; the 8-gram repeats at
                                           # offsets 0 and 8 (within-doc only)
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dup_span_stats(docs, n=8).collect()}
    assert (got[1].n_spans, got[1].n_dup_spans, got[1].n_cross_doc_spans) == (2, 1, 1)
    assert got[1].dup_frac == 0.5
    assert (got[2].n_spans, got[2].n_dup_spans, got[2].n_cross_doc_spans) == (2, 1, 1)
    assert (got[3].n_spans, got[3].n_dup_spans, got[3].n_cross_doc_spans) == (0, 0, 0)
    assert got[3].dup_frac == 0.0
    assert (got[4].n_spans, got[4].n_dup_spans, got[4].n_cross_doc_spans) == (9, 2, 0)
    assert abs(got[4].dup_frac - 2 / 9) < 1e-12


@PROP
@given(st.lists(texts, min_size=1, max_size=25))
def test_cms_estimate_bounds(spark, docs):
    """CMS invariants on arbitrary corpora: every estimate is >= the true
    count and <= the total occurrence count (a full-collision row can
    never exceed the stream length)."""
    from external_benchmarks_spark.operators.sketch import cms_heavy_hitters

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = cms_heavy_hitters(df, k=100, width=16).collect()
    true: dict[str, int] = {}
    total = 0
    for t in docs:
        for tok in t.split():
            true[tok] = true.get(tok, 0) + 1
            total += 1
    assert len(got) == min(100, len(true))
    for r in got:
        assert true[r.token] <= r.est_count <= total


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 1000),
            st.sampled_from(["signup", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_and_transitions_vs_bruteforce(spark, events):
    """Funnel counts and the transition matrix match a row-by-row Python
    reference on arbitrary event streams."""
    from external_benchmarks_spark.operators.funnel import (
        event_funnel,
        event_transitions,
    )

    rows = [
        (u, int(ts) * 60_000_000, i, ty) for i, (u, ts, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])

    # brute-force funnel (first-touch, strictly increasing)
    firsts: dict[int, dict[str, int]] = {}
    for u, ts, _i, ty in rows:
        d = firsts.setdefault(u, {})
        if ty not in d or ts < d[ty]:
            d[ty] = ts
    s0 = sum(1 for d in firsts.values() if "signup" in d)
    s1 = sum(
        1
        for d in firsts.values()
        if "signup" in d and "click" in d and d["click"] > d["signup"]
    )
    s2 = sum(
        1
        for d in firsts.values()
        if "signup" in d
        and "click" in d
        and d["click"] > d["signup"]
        and "purchase" in d
        and d["purchase"] > d["click"]
    )
    frow = event_funnel(df).collect()[0]
    assert (frow.stage0_users, frow.stage1_users, frow.stage2_users) == (s0, s1, s2)

    # brute-force transitions: per user ordered by (ts, event_id)
    want: dict[tuple[str, str], int] = {}
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for u, ts, i, ty in rows:
        by_user.setdefault(u, []).append((ts, i, ty))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.from_type, r.to_type): r.transitions
        for r in event_transitions(df).collect()
    }
    assert got == want


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
def test_rrf_fusion_properties(spark, list_a, list_b):
    """RRF invariants on arbitrary rank lists: score equals the sum of
    the per-list reciprocal contributions; items in both lists score
    strictly higher than either contribution alone; better rank in one
    list (same elsewhere) never lowers the fused score."""
    from external_benchmarks_spark.operators.topk import rrf_fuse

    a = spark.createDataFrame(list_a, "id bigint, rank_a int")
    b = spark.createDataFrame(list_b, "id bigint, rank_b int")
    got = {
        r["id"]: r["rrf"]
        for r in rrf_fuse(a, b, key_col="id", k=1000).collect()
    }
    ra, rb = dict(list_a), dict(list_b)
    for i in set(ra) | set(rb):
        want = (1.0 / (60 + ra[i]) if i in ra else 0.0) + (
            1.0 / (60 + rb[i]) if i in rb else 0.0
        )
        assert got[i] == want
        if i in ra and i in rb:
            assert got[i] > 1.0 / (60 + ra[i])
            assert got[i] > 1.0 / (60 + rb[i])


@PROP
@given(st.randoms(use_true_random=False))
def test_maxsim_chunk_permutation_invariant(spark, rnd):
    """MaxSim scores are invariant to permuting a document's token
    chunks (max over a set) and monotone: adding a query token can
    never lower the score."""
    from external_benchmarks_spark.operators.similarity import maxsim_topk

    base = [round(rnd.uniform(-1, 1), 3) for _ in range(16)]
    chunks = [base[i * 4 : (i + 1) * 4] for i in range(4)]
    perm = chunks[::-1]
    df = spark.createDataFrame(
        [(0, [x for c in chunks for x in c]), (1, [x for c in perm for x in c])],
        "vec_id bigint, embedding array<double>",
    )
    q1 = [[1.0, -0.5, 0.25, 2.0]]
    one = maxsim_topk(df, q1, k=2, n_chunks=4).collect()
    scores = {r["vec_id"]: r["maxsim"] for r in one}
    assert scores[0] == scores[1]  # permutation invariance
    q2 = q1 + [[0.5, 0.5, -1.0, 0.0]]
    two = {
        r["vec_id"]: r["maxsim"]
        for r in maxsim_topk(df, q2, k=2, n_chunks=4).collect()
    }
    # adding a token adds its (possibly negative) best alignment; with a
    # positive-dot guaranteed impossible to assert in general, assert
    # instead the exact decomposition: score(q2) = score(q1) + score(q2[1:])
    solo = {
        r["vec_id"]: r["maxsim"]
        for r in maxsim_topk(df, [q2[1]], k=2, n_chunks=4).collect()
    }
    for vid in (0, 1):
        assert abs(two[vid] - (scores[vid] + solo[vid])) < 1e-9


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.text(alphabet="ab1", min_size=1, max_size=8), min_size=1, max_size=6
    ),
    pair=st.tuples(
        st.text(alphabet="ab1", min_size=1, max_size=2),
        st.text(alphabet="ab1", min_size=1, max_size=2),
    ),
)
def test_bpe_merge_spark_equals_python_twin(spark, words, pair):
    """The Catalyst aggregate merge (operators/bpe._apply_merge) and
    the driver-side loop (_merge_word) are the same algorithm at two
    execution sites — property-checked over random words and rules,
    including lhs==rhs runs and consecutive-occurrence shapes the
    old replace() formulation got wrong."""
    from external_benchmarks_spark.operators.bpe import (
        _apply_merge,
        _merge_word,
    )

    a, b = pair
    spaced = [" " + " ".join(w) + " " for w in words]
    df = spark.createDataFrame([(s,) for s in spaced], "s string")
    got = [
        r.m for r in df.select(_apply_merge(F.col("s"), a, b).alias("m")).collect()
    ]
    want = [
        " " + " ".join(_merge_word(list(w), a, b)) + " " for w in words
    ]
    assert sorted(got) == sorted(want), (words, pair)


@PROP
@given(
    st.lists(texts, min_size=2, max_size=15),
    st.sampled_from([300_000, 600_000, 900_000]),
)
def test_allpairs_jaccard_equals_brute_force(spark, docs, t_ppm):
    """Prefix filtering is COMPLETE on arbitrary corpora: the pruned
    join equals the brute-force pair set at any threshold."""
    import itertools

    from external_benchmarks_spark.operators.setjoin import (
        PPM,
        allpairs_jaccard_join,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.inter, r.un)
        for r in allpairs_jaccard_join(df, threshold_ppm=t_ppm).collect()
    }
    sh = {}
    for i, t in enumerate(docs):
        toks = t.split()
        s = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if s:
            sh[i] = s
    want = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        i, u = len(sh[a] & sh[b]), len(sh[a] | sh[b])
        if i * PPM >= t_ppm * u:
            want.add((a, b, i, u))
    assert got == want


@PROP
@given(st.lists(st.text(alphabet="abcx", min_size=1, max_size=5), min_size=2, max_size=20))
def test_symdelete_equals_brute_force(spark, terms):
    """Deletion-variant blocking is COMPLETE for ed <= 1 on arbitrary
    short strings (the regime where variant collisions are densest)."""
    import itertools

    from external_benchmarks_spark.operators.fuzzyjoin import fuzzy_term_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {(r.term_a, r.term_b, r.dist) for r in fuzzy_term_pairs(df).collect()}
    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(terms)), 2)
        if lev(a, b) <= 1
    }
    assert got == want
