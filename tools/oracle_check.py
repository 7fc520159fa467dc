#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <outDir> [sfDir]

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
parquet tables in sfDir, and compares: column names (sorted), dtypes
(loosely), row count, and cell values (exact for strings/ints, tight
tolerance report for floats so we can see HOW close we are).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def canon(df):
    # driver sorts columns by name before hashing values
    return df[sorted(df.columns)]


def compare(name, got, want):
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    got, want = canon(got), canon(want)
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} oracle={len(want)}"]
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # The driver hashes str(value), so an int64 Spark column vs a
        # float64/object oracle column (e.g. DuckDB SUM(BIGINT) -> HUGEINT
        # -> float) mismatches REMOTELY even when values are numerically
        # equal — caught this with t08's uncast pack_id in r03. Fail here.
        g_int = np.issubdtype(got[c].dtype, np.integer)
        w_int = np.issubdtype(want[c].dtype, np.integer)
        g_f = np.issubdtype(got[c].dtype, np.floating)
        w_f = np.issubdtype(want[c].dtype, np.floating)
        if (g_int and (w_f or want[c].dtype == object)) or \
           (w_int and (g_f or got[c].dtype == object)):
            problems.append(
                f"col {c}: dtype KIND mismatch spark={got[c].dtype} oracle={want[c].dtype} "
                f"(driver hashes these differently — cast the oracle SQL)")
            continue
        if g_f or w_f:
            g = got[c].astype(float).to_numpy()
            w = want[c].astype(float).to_numpy()
            both_nan = np.isnan(g) & np.isnan(w)
            neq = ~both_nan & (g != w)
            if neq.any():
                diff = np.abs(g[neq] - w[neq])
                problems.append(
                    f"col {c}: {neq.sum()}/{len(g)} float cells differ bitwise; max abs diff {np.nanmax(diff):.3e}")
        else:
            if got[c].dtype != want[c].dtype:
                # tolerate int32 vs int64 style gaps but report
                try:
                    g = got[c].astype("object").to_numpy()
                    w = want[c].astype("object").to_numpy()
                except Exception:
                    problems.append(f"col {c}: dtype {got[c].dtype} vs {want[c].dtype}")
                    continue
            neq = pd.Series(g).ne(pd.Series(w)) & ~(pd.Series(g).isna() & pd.Series(w).isna())
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(g)} cells differ, first at row {i}: spark={g[i]!r} oracle={w[i]!r}")
            if got[c].dtype != want[c].dtype:
                problems.append(f"col {c}: dtype note {got[c].dtype} vs {want[c].dtype} (values match)")
    return problems


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_skip = 0
    for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(path)
        if not os.path.isdir(path):
            continue
        got = load_result(path)
        if got is None:
            print(f"SKIP {name}: no parquet output")
            n_skip += 1
            continue
        if name not in oracle:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   - {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip/rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
