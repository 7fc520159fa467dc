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
    """Mirror the driver's hash basis EXACTLY: the driver sorts columns
    by name and hashes str(value) per cell, so the only comparison that
    predicts the remote gate is exact str(value) equality — any dtype
    that round-trips differently through the two client layers (numpy
    int vs float repr, Python Decimal vs float64, None vs nan) fails
    HERE the way it fails THERE. The r8 escape (DECIMAL(38,0) output
    read as Decimal on the Spark side, float64 from DuckDB) slipped a
    tolerance-based float path; there is no tolerance path anymore —
    numeric diffs are reported as diagnostics only, after the str gate
    has already failed the query."""
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    got, want = canon(got), canon(want)
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} oracle={len(want)}"]
    for c in got.columns:
        g = np.array([str(v) for v in got[c].tolist()], dtype=object)
        w = np.array([str(v) for v in want[c].tolist()], dtype=object)
        neq = g != w
        if neq.any():
            i = int(np.argmax(neq))
            msg = (f"col {c}: {int(neq.sum())}/{len(g)} str(value) cells differ "
                   f"(driver hash basis), first at row {i}: "
                   f"spark={g[i]!r} ({type(got[c].iloc[i]).__name__}/{got[c].dtype}) "
                   f"oracle={w[i]!r} ({type(want[c].iloc[i]).__name__}/{want[c].dtype})")
            # numeric diagnostic: are the differing cells at least close?
            try:
                gf = got[c].astype(float).to_numpy()
                wf = want[c].astype(float).to_numpy()
                diff = np.abs(gf[neq] - wf[neq])
                msg += f"; numeric max abs diff {np.nanmax(diff):.3e}"
            except (ValueError, TypeError):
                pass
            problems.append(msg)
        # dtype-kind early warning even when str matches (belt+braces:
        # identical str with differing kinds is near-impossible, but a
        # kind gap on an all-null column would hide until data arrives)
        g_num = got[c].dtype != object
        w_num = want[c].dtype != object
        if g_num != w_num and not neq.any():
            problems.append(
                f"col {c}: dtype KIND mismatch spark={got[c].dtype} "
                f"oracle={want[c].dtype} (str matches NOW, but the kinds "
                f"render nulls/values differently — cast one side)")
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
