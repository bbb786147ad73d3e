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
    """Typed, repr-level — as strict as the driver's typed value-hash: no
    float re-rounding, no -0.0 fixup, and the Python type is part of the
    key (a DuckDB Decimal vs Spark int mismatch FAILS here like it fails
    the driver gate — the round-5 compare_counts_full lesson)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple((type(r[i]).__name__, repr(r[i])) for i in idx) for r in rows]
    out.sort()
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


def test_mm3_sql_bit_exact():
    """The in-SQL murmur3-x64-128 low64 (the generator behind every
    sketch-valued oracle) is bit-exact against the numpy kernel on random
    ASCII 21-grams and on real corpus grams."""
    import numpy as np

    from finchspark.kernels.murmur3 import murmur3_x64_128_low64

    rng = np.random.default_rng(11)
    chars = np.array(
        list("abcdefghijklmnopqrstuvwxyzABCDEF0123456789 {}();=#\n\t_"), dtype="U1"
    )
    grams = list(
        dict.fromkeys("".join(rng.choice(chars, 21)) for _ in range(1500))
    )
    con = duckdb.connect()
    real = con.execute(
        f"select distinct substring(text, 1 + (doc_id % 40), 21) as g "
        f"from '{SF_DIR}/documents.parquet' where length(text) >= 70"
    ).fetchall()
    grams += [r[0] for r in real if r[0] and len(r[0].encode()) == 21]
    grams = list(dict.fromkeys(grams))

    mat = np.frombuffer("".join(grams).encode(), np.uint8).reshape(-1, 21)
    want = murmur3_x64_128_low64(mat, 0).astype(np.uint64)

    con.execute("create table g(gram varchar)")
    con.executemany("insert into g values (?)", [(x,) for x in grams])
    got = dict(con.execute(entry._mm3_subquery("select gram from g")).fetchall())
    bad = [g for g, w in zip(grams, want) if int(got[g]) != int(w)]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:2]}"


def test_mm3_sql_rejects_unsupported_length():
    with pytest.raises(ValueError):
        entry._mm3_subquery("select gram from g", length=16)
    with pytest.raises(ValueError):
        entry._mm3_subquery("select gram from g", length=33)
