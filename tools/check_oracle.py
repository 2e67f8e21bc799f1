#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the fixture parquet files
as DuckDB views named by table, runs each oracle, loads the matching Spark
parquet output, sorts columns by name, and compares row-by-row values.
This is a strict approximation of the driver's hash compare: if this
passes, the driver's should too.  Dev-only tool — NOT part of the Scala
library and never invoked by the driver.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir, only=None):
    # One FRESH connection per query: a single connection across the
    # full 400-query sweep accumulates allocator state until DuckDB
    # dies with spurious "Out of Memory Error: Failed to allocate
    # block of 16384 bytes" failures late in the run (r10: 36 such
    # phantoms after ~350 queries on an otherwise idle 128 GiB box).
    # Views are re-created per query — microseconds against parquet.
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        sql = oracles[name]
        con = fresh_con(sf_dir)
        # Skip (don't fail) queries with no Spark dump: Verify --only
        # writes a subset, and evaluating every DuckDB oracle anyway
        # (some unrolled-CTE oracles take minutes) made the fast path slow.
        import glob as _glob
        if not _glob.glob(f"{out_dir}/{name}/*.parquet"):
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols = list(oracle_rel.columns)
            orows = oracle_rel.fetchall()
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = list(spark_rel.columns)
            srows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # Type-strict gate: the driver's hash is type-sensitive, so a
        # DuckDB HUGEINT (int128 from SUM over BIGINT) vs Spark BIGINT
        # mismatch fails there even when values are identical.  Compare
        # DuckDB's inferred type for each column in both relations.
        otypes = {c: str(t) for c, t in zip(ocols, oracle_rel.types)}
        stypes = {c: str(t) for c, t in zip(scols, spark_rel.types)}
        tbad = [(c, otypes[c], stypes[c]) for c in sorted(ocols)
                if otypes[c] != stypes[c]]
        if tbad:
            print(f"FAIL {name}: column types differ (oracle vs spark):")
            for c, ot, st in tbad:
                print(f"  {c}: oracle={ot} spark={st}")
            n_fail += 1
            continue
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        orows = [tuple(norm(r[i]) for i in operm) for r in orows]
        srows = [tuple(norm(r[i]) for i in sperm) for r in srows]
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:")
            print(f"  cols:   {sorted(ocols)}")
            print(f"  oracle: {a}")
            print(f"  spark:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = None
    if len(sys.argv) >= 5 and sys.argv[3] == "--only":
        only = set(sys.argv[4].split(","))
    sys.exit(main(sys.argv[1], sys.argv[2], only))
