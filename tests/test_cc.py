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
        for r in connected_components(df, small_graph_threshold=0).collect()
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
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, small_graph_threshold=0).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 64


@pytest.mark.parametrize("salt_buckets,check_every", [(4, 1), (8, 2), (0, 3)])
def test_cc_salting_and_check_interval_equivalence(spark, salt_buckets, check_every):
    """Hub salting and a sparser convergence check change the plan, never the
    result — exercised on a star graph (worst-case hub) + a chain tail."""
    star = [(0, i) for i in range(1, 40)]
    chain = [(100 + i, 101 + i) for i in range(10)]
    edges = star + chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, salt_buckets=salt_buckets, check_every=check_every,
            small_graph_threshold=0
        ).collect()
    }
    expect = union_find_components(200, edges)
    nodes = {x for e in edges for x in e}
    for u in nodes:
        assert got[u] == expect[u]


def test_cc_durable_checkpoint(spark, tmp_path):
    edges = [(i, i + 1) for i in range(20)] + [(50, 51), (51, 52)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "cc_state")
        ).collect()
    }
    expect = union_find_components(60, edges)
    for u in {x for e in edges for x in e}:
        assert got[u] == expect[u]
    # durable state actually landed on disk
    assert any((tmp_path / "cc_state").glob("cc_iter_*"))


def test_cc_durable_checkpoint_writes_only_check_rounds(spark, tmp_path):
    """Durable state is written only on convergence-check rounds (else the
    check_every batching of driver actions buys nothing), and superseded
    cc_iter_* directories are deleted after convergence — only the converged
    resume point (the lineage root of the returned frame) remains."""
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(
        df, checkpoint_dir=str(tmp_path / "cc_state"), check_every=3
    )
    remaining = sorted((tmp_path / "cc_state").glob("cc_iter_*"))
    assert len(remaining) == 1
    # the returned frame stays readable after cleanup (lineage -> last dir)
    got = {r["node"]: r["component"] for r in out.collect()}
    expect = union_find_components(31, edges)
    for u in range(31):
        assert got[u] == expect[u]
    # the surviving directory is a check-round iteration (durable writes on
    # check rounds only: iterations 2, 5, 8... for check_every=3)
    it = int(remaining[0].name.split("_")[-1])
    assert (it + 1) % 3 == 0 or it == -1


def test_cc_numpy_labels_vs_union_find():
    import random

    import numpy as np

    from finchspark.operators.cc import cc_labels_numpy

    for n, m, seed in [(50, 30, 1), (300, 500, 2), (64, 63, 3)]:
        rng = random.Random(seed)
        if seed == 3:
            edges = [(i, i + 1) for i in range(63)]  # worst-case chain
        else:
            edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        src = np.array([a for a, _ in edges])
        dst = np.array([b for _, b in edges])
        nodes, comp = cc_labels_numpy(src, dst)
        expect = union_find_components(n, edges)
        got = dict(zip(nodes.tolist(), comp.tolist()))
        for u in got:
            assert got[u] == expect[u], (u, got[u], expect[u])


def test_cc_small_graph_path_equals_star_path(spark):
    import random

    rng = random.Random(9)
    edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components(df, small_graph_threshold=0).collect()
    }
    assert fast == star
    # the fast-path plan is a single stage: no star-round joins
    plan = connected_components(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_cc_incremental_delta_rows(spark):
    """connected_components_incremental_delta's changed set: applying it
    over prev (override by node) reproduces the full map exactly, and rows
    of untouched components never appear in it."""
    from finchspark.operators.cc import (
        connected_components_incremental_delta,
    )

    prev = spark.createDataFrame(
        # components {1,2,3}->1, {10,11}->10, {20,21}->20 (untouched)
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "node long, component long",
    )
    # merge {1..3} with {10,11} via a new node 5, plus a brand-new pair
    edges = spark.createDataFrame(
        [(3, 5), (5, 10), (30, 31)], "src long, dst long"
    )
    full, changed = connected_components_incremental_delta(prev, edges)
    got_full = {(r["node"], r["component"]) for r in full.collect()}
    got_changed = {(r["node"], r["component"]) for r in changed.collect()}
    assert got_full == {
        (1, 1), (2, 1), (3, 1), (5, 1), (10, 1), (11, 1),
        (20, 20), (21, 20), (30, 30), (31, 30),
    }
    # changed = new nodes + relabelled members; 1,2,3 keep label 1 and the
    # 20-component is untouched, so none of them may appear
    assert got_changed == {(5, 1), (10, 1), (11, 1), (30, 30), (31, 30)}
    # override-apply changed over prev == full
    applied = {n: c for n, c in {r["node"]: r["component"] for r in prev.collect()}.items()}
    applied.update({n: c for n, c in got_changed})
    assert {(n, c) for n, c in applied.items()} == got_full


def test_cc_incremental_delta_broadcast_guard(spark):
    """ADVICE r4: the remap broadcast is guarded, not forced — the
    shuffle-join fallback (bulk epoch where a corpus-sized remap would OOM
    the forced broadcast) returns the identical map/changed set, and with
    broadcast_remap=False no BroadcastHashJoin touches the remap path."""
    from finchspark.operators.cc import connected_components_incremental_delta

    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "node long, component long",
    )
    edges = spark.createDataFrame(
        [(3, 5), (5, 10), (30, 31)], "src long, dst long"
    )
    results = {}
    for flag in (True, False, None):
        full, changed = connected_components_incremental_delta(
            prev, edges, broadcast_remap=flag
        )
        results[flag] = (
            {(r["node"], r["component"]) for r in full.collect()},
            {(r["node"], r["component"]) for r in changed.collect()},
        )
    assert results[True] == results[False] == results[None]


@pytest.mark.parametrize("seed", [3, 17])
def test_cc_incremental_matches_full_recompute(spark, seed):
    """connected_components_incremental over random epoch splits equals the
    batch CC over the union edge set AFTER EVERY EPOCH — exactness, not
    approximation (min-id labels make the contracted delta graph's labels
    identical to the full graph's)."""
    import random

    from finchspark.operators.cc import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(seed)
    edges = [
        (rng.randrange(0, 120), rng.randrange(0, 120)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    cuts = sorted(rng.sample(range(1, len(edges)), 3))
    epochs = [
        edges[i:j] for i, j in zip([0] + cuts, cuts + [len(edges)])
    ]

    prev = None
    seen: list = []
    for ep in epochs:
        seen.extend(ep)
        e = spark.createDataFrame(ep, "src long, dst long")
        prev = (
            connected_components(e)
            if prev is None
            else connected_components_incremental(prev, e)
        )
        got = {(r["node"], r["component"]) for r in prev.collect()}
        full = connected_components(
            spark.createDataFrame(seen, "src long, dst long")
        )
        want = {(r["node"], r["component"]) for r in full.collect()}
        assert got == want
        prev = spark.createDataFrame(sorted(got), "node long, component long")
