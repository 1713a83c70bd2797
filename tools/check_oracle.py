#!/usr/bin/env python3
"""Local dev twin of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]

Pipeline: run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this
script loads every <outDir>/<name> parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB against views over the same fixture
tables, and compares: row count, column names, and exact values after
sorting columns by name and rows by all columns — the driver's hash-match,
minus the hashing. Local green ⇒ driver green.

Driver-side tooling only (duckdb/pandas are NOT available to the Scala
library and are not used by it).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Normalize a cell for exact-compare: floats rounded to 9 significant
    ish digits (Spark/DuckDB agree to well past that on the decimal-exact
    pipelines; genuine float pipelines are avoided by design), NaN/None
    canonicalized, nested lists/dicts recursed."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(v, ".9g")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # The driver's pandas row-sorter crashes on array-typed cells — an
    # array output column must be a hard local FAIL, not a silent
    # normalize (serialize arrays to strings in the QUERY instead).
    for r in rows[:50]:
        for c, v in zip(cols, r):
            if isinstance(v, (list, tuple)):
                raise RuntimeError(
                    f"array-typed cell in column '{c}' — driver-fatal; "
                    "serialize it (concat_ws/to_json) in the query")
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, data


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"MISS  {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            s_cols, s_rows = frame(con, f"SELECT * FROM '{res_dir}/*.parquet'")
            o_cols, o_rows = frame(con, oracle[name])
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns {s_cols} vs oracle {o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rows {len(s_rows)} vs oracle {len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            diff = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
            print(f"FAIL  {name}: first differing row #{diff}:")
            print(f"      spark : {s_rows[diff]}")
            print(f"      oracle: {o_rows[diff]}")
            n_fail += 1
        else:
            flag = " (0 rows!)" if not s_rows else ""
            print(f"pass  {name}: {len(s_rows)} rows{flag}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
