#!/usr/bin/env python3
"""Snapshot preflight: recompute SuiteStamp.digest without sbt and compare
it to the committed SUITE_STAMP.

The stamp digest is pure file hashing (SuiteStamp.scala): SHA-256 over the
sorted repo-relative paths and raw bytes of every suite-relevant source
input — src/main + src/test *.scala, the top level of project/
(build.properties, *.sbt, *.scala), and build.sbt — each contribution
framed as `path-bytes 0x00 file-bytes 0x00`.

Exit 0 when the tree matches the stamp, 1 (with both digests printed)
when it does not. Run this before every end-of-round snapshot: a mismatch
means source changed after the last green `tools/run_suite.sh` and the
committed tree's own `sbt test` is red (SuiteStampSpec) — the r15/r16/r20
failure this preflight exists to make impossible.
"""
import hashlib
import pathlib
import sys


def digest(root: pathlib.Path) -> str:
    files = []
    for d in ("src/main", "src/test"):
        p = root / d
        if p.is_dir():
            files += [f for f in p.rglob("*.scala") if f.is_file()]
    proj = root / "project"
    if proj.is_dir():
        files += [f for f in proj.iterdir() if f.is_file() and
                  (f.name == "build.properties" or f.suffix in (".sbt", ".scala"))]
    files.append(root / "build.sbt")
    md = hashlib.sha256()
    for rel, f in sorted((f.relative_to(root).as_posix(), f) for f in files):
        md.update(rel.encode("utf-8"))
        md.update(b"\x00")
        md.update(f.read_bytes())
        md.update(b"\x00")
    return md.hexdigest()


def main() -> int:
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".").resolve()
    stamp_file = root / "SUITE_STAMP"
    if not stamp_file.is_file():
        print("FAIL: no SUITE_STAMP file at", stamp_file)
        return 1
    stamp = stamp_file.read_text().strip()
    d = digest(root)
    if d == stamp:
        print(f"OK: SUITE_STAMP matches the source tree ({d})")
        return 0
    print("FAIL: SUITE_STAMP is stale — the committed tree's own sbt test is red.")
    print(f"  SUITE_STAMP: {stamp}")
    print(f"  tree digest: {d}")
    print("  Fix: tools/run_suite.sh (green suite re-mints the stamp), then")
    print("  commit the stamp TOGETHER with the source change.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
