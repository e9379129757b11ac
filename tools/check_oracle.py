#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf_dir tables, and
compares row count, column names, and a row-order-independent hash of the
values (columns sorted by name, rows sorted).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Column-name-sorted, row-sorted canonical form with float rounding."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
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
            got = con.execute(
                f"SELECT * FROM '{res_path}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        cg, cw = canon(got, got_cols), canon(want, want_cols)
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
