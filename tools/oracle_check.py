#!/usr/bin/env python
"""Self-check harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row-count, schema (column names), and a value hash with columns
sorted by name and rows sorted canonically.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()  # numpy scalars from the pandas fetch -> Python natives
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from xcrawl3r_spark.session import get_spark

    spark = get_spark(app="oracle_check", master="local[16]",
                      shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            # Fetch via pandas, NOT fetchall(): the driver's gate fetches a
            # frame, where DuckDB HUGEINT degrades to float64 (r01 red rows:
            # 60-bit sums > 2^53 lose bits; 113 renders "113.0"). fetchall()
            # returns exact Python ints and hides that class of bug.
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs, ho = value_hash(scols, srows), value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"hash spark={hs} oracle={ho}")
                # show first diff
                os_ = sorted(range(len(scols)), key=lambda i: scols[i])
                oo_ = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("\x01".join(_norm(r[i]) for i in os_) for r in srows)
                oset = sorted("\x01".join(_norm(r[i]) for i in oo_) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        problems.append(f"  first diff:\n   spark : {a!r}\n   oracle: {b!r}")
                        break
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
