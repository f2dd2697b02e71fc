#!/usr/bin/env bash
# Bench entry point whose LAST stdout line is the bare result JSON.
# sbt decorates stdout with [info]/[success] lines that bury the JSON the
# driver parses — so run sbt with its output on stderr and cat the JSON
# file (written by graft.Bench) as the only stdout output.
#
# A failed sbt run must NOT cat a stale bench_result.json from a previous
# run as if it were fresh — propagate the failure instead.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
if ! sbt -batch "runMain graft.Bench" 1>&2; then
  echo "bench run failed; not emitting (possibly stale) bench_result.json" 1>&2
  exit 1
fi
cat bench_result.json
