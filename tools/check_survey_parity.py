#!/usr/bin/env python3
"""SURVEY §2 parity gate: declared == implemented, both directions.

Usage:
  sbt -batch "runMain graft.QueryList /tmp/query_ids.txt"
  python3 tools/check_survey_parity.py /tmp/query_ids.txt [SURVEY.md]

Checks:
  1. every implemented query ID appears (backticked) in SURVEY §2;
  2. every §2 backticked token that LOOKS like a query ID (known
     category prefix + underscore) is implemented.
Dev-only tool — not part of the Scala library, never run by the driver.
"""
import re
import sys

PREFIXES = ("scan_", "catalog_", "dq_", "export_", "filter_", "null_",
            "join_", "sql_", "agg_", "win_", "sort_", "topk_", "set_",
            "fn_", "ds_", "udf_", "stream_", "llm_", "text_", "dedup_",
            "ann_", "mm_", "ts_", "stat_", "graph_", "heat_")
# backticked §2 tokens with an ID-like prefix that are NOT query IDs
ALLOW = {"fn_edit_distance_alias", "agg_pushdown"}


def main(ids_file, survey="SURVEY.md"):
    implemented = {l.strip() for l in open(ids_file) if l.strip()}
    text = open(survey).read()
    m = re.search(r"## §2\..*?(?=\n## §3)", text, re.S)
    if not m:
        print("FAIL: cannot locate §2..§3 region")
        return 1
    sec2 = m.group(0)
    ticked = set(re.findall(r"`([a-z0-9_]+)`", sec2))
    declared = {t for t in ticked
                if t.startswith(PREFIXES) and "_" in t and t not in ALLOW}
    missing_doc = sorted(implemented - set(
        t for t in ticked if t in implemented))
    undeclared = sorted(t for t in declared if t not in implemented)
    ok = True
    if missing_doc:
        ok = False
        print(f"FAIL: {len(missing_doc)} implemented but not in §2:")
        for t in missing_doc:
            print(f"  {t}")
    if undeclared:
        ok = False
        print(f"FAIL: {len(undeclared)} in §2 but not implemented:")
        for t in undeclared:
            print(f"  {t}")
    if ok:
        print(f"OK: {len(implemented)} implemented, "
              f"{len(declared)} §2-declared, zero diff both directions")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], *sys.argv[2:3]))
