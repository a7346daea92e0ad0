"""Round-7 operator tests: triangle census."""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from petastorm_spark.session import get_spark

    return get_spark("round7-tests")


def _census(spark, edge_list):
    from petastorm_spark.operators.graph import triangle_census

    e = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    return triangle_census(e).collect()[0]


def test_triangle_census_k4(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, each node deg 3 ->
    # 4 * C(3,2) = 12 wedges, clustering = 3*4/12 = 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _census(spark, k4)
    assert (r.n_triangles, r.n_wedges, r.clustering_coeff) == (4, 12, 1.0)


def test_triangle_census_path_has_no_triangles(spark):
    r = _census(spark, [(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0
    assert r.n_wedges == 2
    assert r.clustering_coeff == 0.0


def test_triangle_census_canonicalizes_multigraph_input(spark):
    # duplicates, reversed orientation, and self-loops collapse to one
    # triangle
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    r = _census(spark, messy)
    assert r.n_triangles == 1
    assert r.n_wedges == 3
    assert r.clustering_coeff == 1.0


def test_triangle_census_hub_counts_once_per_triangle(spark):
    # star + one rim edge: hub 0 connects to 1..5, rim edge (1,2)
    # closes exactly one triangle; degree orientation must not
    # double-count it from different pivots
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    r = _census(spark, star)
    assert r.n_triangles == 1
    # hub deg 5 -> 10 wedges, nodes 1,2 deg 2 -> 1 each
    assert r.n_wedges == 12


def test_triangle_census_empty_graph(spark):
    from petastorm_spark.operators.graph import triangle_census

    e = spark.createDataFrame([], "src bigint, dst bigint")
    r = triangle_census(e).collect()[0]
    assert (r.n_triangles, r.n_wedges, r.clustering_coeff) == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# kcore_decompose
# ---------------------------------------------------------------------------


def test_kcore_keeps_k4_peels_chain(spark):
    from petastorm_spark.operators.graph import kcore_decompose

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13)]
    e = spark.createDataFrame(k4 + chain, "src bigint, dst bigint")
    out = {r.node: r.deg for r in kcore_decompose(e, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_peeling_cascades_across_rounds(spark):
    # path a-b-c-d under k=2: endpoints peel first, then the middle
    # unravels - requires MULTIPLE rounds, not one degree filter
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    assert kcore_decompose(e, k=2, max_rounds=5).collect() == []


def test_kcore_respects_max_rounds(spark):
    # one round of the same path only removes the endpoints' edges
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    one = {r.node for r in kcore_decompose(e, k=2, max_rounds=1).collect()}
    assert one == {2, 3}


def test_kcore_rejects_bad_k(spark):
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="k must be"):
        kcore_decompose(e, k=0)
