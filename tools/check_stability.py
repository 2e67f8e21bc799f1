#!/usr/bin/env python3
"""Cross-run / cross-partitioning value-stability check.

Usage: python3 tools/check_stability.py <verifyOutDirA> <verifyOutDirB>

Compares every query dumped by TWO independent Verify runs (typically
one at the driver's local[4] and one at local[32]) value-for-value —
the determinism property the whole oracle gate rests on: results must
not depend on partition count, task scheduling, or run order. Reads
both parquet dumps through DuckDB, sorts columns by name and rows by
value (the driver's hash-compare normalization), and reports any
query whose two runs differ.

Dev-only tool — never invoked by the driver.
"""
import math
import os
import sys

import duckdb


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


def sort_key(row):
    # None is not orderable against values in py3 — sort on a
    # type-tagged string projection (both runs use the same key, so
    # equal multisets compare equal after sorting)
    return tuple((v is not None, str(type(v)), str(v)) for v in row)


def load(con, path):
    rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = list(rel.columns)
    perm = [cols.index(c) for c in sorted(cols)]
    rows = sorted((tuple(norm(r[i]) for i in perm) for r in rel.fetchall()),
                  key=sort_key)
    return sorted(cols), rows


def main(a_dir, b_dir):
    names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir))
                   - {"oracle_sql.json"})
    n_pass = n_fail = 0
    for name in names:
        con = duckdb.connect()
        try:
            ca, ra = load(con, f"{a_dir}/{name}")
            cb, rb = load(con, f"{b_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if ca != cb:
            print(f"FAIL {name}: columns {ca} vs {cb}")
            n_fail += 1
        elif ra != rb:
            bad = next(i for i, (x, y) in enumerate(zip(ra, rb)) if x != y) \
                if len(ra) == len(rb) else -1
            print(f"FAIL {name}: rows differ "
                  f"(n {len(ra)} vs {len(rb)}, first diff at {bad})")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} stable, {n_fail} unstable "
          f"(of {len(names)} common queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
