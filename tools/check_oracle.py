#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result dumped by graft.Verify (via pandas, as
the driver does), runs the matching oracle SQL from oracle_sql.json in
DuckDB (materialized to a pandas frame via .df(), as the driver does),
and compares row count, column names, and a row-order-independent hash
of the values (columns sorted by name, rows sorted, full-precision str).

Using pandas on BOTH sides is load-bearing: DuckDB HUGEINT (any sum()
over integers) becomes float64 in pandas, so "4.0" != Spark's "4" even
though fetchall() would have returned equal Python ints. The fetchall
version of this script was blind to exactly that class (rounds 1-2:
q_sessionize, t_token_count).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Column-name-sorted, row-sorted canonical form, full-precision str.

    NaN is canonicalized the same as NULL deliberately: pandas represents
    SQL NULL in float64 columns as NaN on BOTH sides of this compare
    (pd.read_parquet and duckdb .df()), so the two are indistinguishable
    here anyway; no graft query legitimately produces NaN. Full-precision
    str() means NO float tolerance — every float-producing query must
    snap its value through a DECIMAL cast on both engines (see
    Relational.dsum / the ratio-rounding recipes) before surfacing it.
    """
    cols = sorted(df.columns)

    def norm(v):
        if v is None or (isinstance(v, float) and v != v):
            return "\0NULL"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    rows = [tuple(norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (a directory of part files), e.g. the
            # ScaleUp-generated sf1 dir; driver testdata is single files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            parts = sorted(glob.glob(os.path.join(res_path, "*.parquet")))
            got = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if cg != cw:
            bad = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"  got  {cg[i]}")
                print(f"  want {cw[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


