#!/usr/bin/env python3
"""Local dev twin of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views over the
same fixture tables, and compares: row count, column names, dtypes, and
exact values. MIRRORS THE DRIVER'S GATE (VERDICT r2 #3): columns sorted by
name, then rows sorted by ALL columns before the value compare — and any
array/list-typed cell is an immediate FAIL, because the driver's pandas
row-sorter crashes on unhashable numpy arrays (that crash shipped two red
gate rows in round 2; this tool must catch it locally first).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def array_cols(df):
    """Columns holding list/ndarray cells — these crash the driver's
    row-sorter (`TypeError: unhashable type: 'numpy.ndarray'`)."""
    if not len(df):
        return []
    bad = []
    for c in df.columns:
        # scan for the first non-null cell: a nullable array column whose
        # row 0 is None would otherwise slip through to the row sort
        for v in df[c]:
            if v is None:
                continue
            if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                bad.append(c)
            break
    return bad

def row_sorted(df):
    """The driver sorts rows by every column before hashing; mirror it."""
    if not len(df.columns):
        return df
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        rpath = os.path.join(out_dir, name)
        got = load_result(rpath)
        if got is None:
            print(f"FAIL {name}: no spark result at {rpath}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got, exp = norm(got), norm(exp)
        problems = []
        bad = sorted(set(array_cols(got)) | set(array_cols(exp)))
        if bad:
            problems.append(
                f"array-typed column(s) {bad} crash the driver's row-sorter "
                "(unhashable ndarray) — serialize them (concat_ws / "
                "array_to_string) in BOTH engines")
        elif list(got.columns) != list(exp.columns):
            problems.append(f"columns spark={list(got.columns)} oracle={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows spark={len(got)} oracle={len(exp)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    problems.append(f"dtype[{c}] spark={got[c].dtype} oracle={exp[c].dtype}")
            if not problems:
                # exact value compare after the driver's row sort; catch
                # EVERYTHING — an unsortable cell raising TypeError must
                # fail THIS query, not abort the remaining gate run
                try:
                    pd.testing.assert_frame_equal(
                        row_sorted(got), row_sorted(exp), check_exact=True)
                except AssertionError as e:
                    msg = str(e).split("\n")
                    problems.append("values differ: " + " | ".join(msg[:6]))
                except Exception as e:
                    problems.append(f"compare crashed ({type(e).__name__}: {e})"
                                    " — mirrors a driver row-sorter crash")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
