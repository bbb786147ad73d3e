"""Connected components vs a scalar union-find oracle on random graphs."""
import random

import pytest

from finchspark.operators.cc import connected_components
from tests.conftest import union_find_components


@pytest.mark.parametrize("n,m,seed", [(30, 20, 1), (100, 80, 2), (200, 400, 3), (50, 0, 4)])
def test_cc_random_graph(spark, n, m, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expect = union_find_components(n, edges)
    # restrict to nodes that appear in edges (isolated nodes never enter CC)
    nodes = {x for e in edges for x in e if e[0] != e[1]}
    for u in nodes:
        for v in nodes:
            assert (got[u] == got[v]) == (expect[u] == expect[v]), (u, v)
    # component labels are the min node id of the component
    for u in nodes:
        assert got[u] == expect[u]


def test_cc_chain_and_star(spark):
    # a long chain (worst case for label propagation; log rounds for star alg)
    chain = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 64
