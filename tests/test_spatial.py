"""Grid radius join: brute-force completeness (incl. hypothesis random
points and negative coordinates — truncating div still satisfies the
grid lemma) and boundary exactness."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from external_benchmarks_spark.operators.spatial import grid_radius_pairs

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute(pts, r):
    out = set()
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(sorted(pts), 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= r * r:
            out.add((ia, ib, d2))
    return out


def _spark(spark, pts, r):
    df = spark.createDataFrame(pts, "id long, x long, y long")
    return {
        (p.id_a, p.id_b, p.dist2)
        for p in grid_radius_pairs(df, radius=r).collect()
    }


def test_boundary_and_corners(spark):
    r = 10
    pts = [
        (1, 0, 0),
        (2, 10, 0),    # exactly r -> kept
        (3, 11, 0),    # just outside
        (4, 7, 7),     # sqrt(98) < 10 -> kept
        (5, 8, 8),     # sqrt(128) > 10 from origin; near 4
        (6, 100, 100), # far
    ]
    assert _spark(spark, pts, r) == _brute(pts, r)
    got = _spark(spark, pts, r)
    assert (1, 2, 100) in got and not any(p[:2] == (1, 3) for p in got)


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_matches_brute_force_on_random_points(spark, coords):
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    assert _spark(spark, pts, 17) == _brute(pts, 17)
