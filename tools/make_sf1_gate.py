#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF1_SELF.json from a check_oracle.py run.

Usage: python3 tools/make_sf1_gate.py <verify_out_dir> <sf1_dir> [note]

Runs the same gate as the driver (tools/check_oracle.py) over the
ScaleUp-generated scaled dir, then writes the self-gate artifact in the
committed shape: per-query result row counts for the PASSes, the table
scale actually gated, and the pass/fail totals. Exits nonzero (and still
writes the artifact, with the FAIL lines embedded) if any query fails —
the artifact must never silently record a red gate as green.
"""
import json
import os
import re
import subprocess
import sys

import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else (
        "scaled 10x from sf0.1 via graft.tools.ScaleUp (block-replication; "
        "salt after EVERY word keyed on (blk, preceding word) so no "
        "cross-block 3-gram survives and within-block spans salt "
        "offset-independently; flat +/-0.1% embedding jitter; block 0 = "
        "shipped sf0.1 verbatim)")
    here = os.path.dirname(os.path.abspath(__file__))
    p = subprocess.run(
        [sys.executable, os.path.join(here, "check_oracle.py"), out_dir, sf_dir],
        capture_output=True, text=True)
    rows, fails = {}, []
    for line in p.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            rows[m.group(1)] = int(m.group(2))
        elif line.startswith("FAIL"):
            fails.append(line.strip())
    # A crashed gate must read as RED, not as an empty green: if the
    # oracle run exited nonzero without emitting parseable FAIL lines
    # (missing oracle_sql.json, import error, bad args — the traceback
    # goes to stderr), or emitted no verdict lines at all, record the
    # stderr tail as the failure and exit 1.
    if not fails and (p.returncode != 0 or not rows):
        tail = (p.stderr or p.stdout or "").strip().splitlines()[-5:]
        fails.append(
            f"GATE CRASH: check_oracle.py rc={p.returncode}, "
            f"{len(rows)} PASS lines parsed; tail: " + " | ".join(tail))
    con = duckdb.connect()
    scale = {}
    for t in ["lineitem", "orders", "events", "documents", "embeddings",
              "customer"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        if os.path.exists(path):
            scale[t] = con.execute(
                f"SELECT count(*) FROM '{pat}'").fetchone()[0]
    artifact = {
        "metric": "correctness_self_run",
        "sf_dir": note,
        "scale": scale,
        "gate": "tools/check_oracle.py (same rows/schema/hash compare as the driver)",
        "n_pass": len(rows),
        "n_fail": len(fails),
        "rows": dict(sorted(rows.items())),
    }
    if fails:
        artifact["failures"] = fails
    dest = os.path.join(here, "..", "CORRECTNESS_SF1_SELF.json")
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {os.path.normpath(dest)}: {len(rows)} pass / {len(fails)} fail")
    if fails:
        print("\n".join(fails))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
