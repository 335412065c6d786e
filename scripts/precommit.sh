#!/usr/bin/env bash
# The per-commit ritual (COVERAGE.md, r11 lesson — twice violated, r11 and
# r17, both times by a "just one more shape" query commit whose plan failed
# the audit at HEAD): a commit that adds or touches ANY query registered in
# SparkEntry.queries must ship with a full green `sbt test`, not a targeted
# testOnly. Run this before committing; it fails loudly on the first red.
#
# Usage: scripts/precommit.sh
set -euo pipefail
cd "$(dirname "$0")/.."
echo "[precommit] full sbt test (the r11/r17 lesson: plan audits cover every"
echo "[precommit] registered query — a targeted testOnly cannot)"
sbt -batch test
