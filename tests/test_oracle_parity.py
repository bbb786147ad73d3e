"""Driver-contract parity: every `queries()` entry with an `oracle_sql()`
twin must match DuckDB on row count, column names, and sorted values —
exactly what the driver's correctness gate checks (at sf=0.01; here sf0.001
for speed, `scripts/oracle_parity.py` runs the full sf0.01 sweep)."""
import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = entry.oracle_sql()
_QUERIES = entry.queries()


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem", "orders"):
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"create view {t} as select * from '{p}'")
    return con.execute(sql)


def _normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        key = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            key.append(v)
        out.append(tuple(key))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    q = _QUERIES[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = _duck(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    got = _normalize(srows, scols)
    want = _normalize(drows, dcols)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without oracles must at least execute and return a stable
    schema (the driver's weaker rows-only check)."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.columns
    df.limit(5).collect()


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"key_a", "key_b", "jaccard", "cluster_id"} <= set(df.columns)
