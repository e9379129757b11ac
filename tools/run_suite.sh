#!/bin/sh
# Full-suite runner with suite-before-snapshot stamping (see SuiteStamp):
# runs `sbt test` in stamp-refresh mode (SuiteStampSpec records the source
# digest instead of asserting it), and promotes the recorded digest to
# SUITE_STAMP only when the WHOLE suite exits green. Commit SUITE_STAMP
# together with the source change; a source edit that skips this script
# leaves a tree whose own `sbt test` is red.
set -e
cd "$(dirname "$0")/.."
GRAFT_SUITE_STAMP=update sbt -batch test
cp target/SUITE_STAMP.pending SUITE_STAMP
echo "SUITE_STAMP updated: $(cat SUITE_STAMP)"
