#!/usr/bin/env bash
# DuckDB-equality fuzz gate (VERDICT r7 #5): the driver's correctness
# pipeline (graft.Verify dump + compare_oracle.py) replayed over SEEDED
# HOSTILE tables instead of the clean testdata. FuzzTables.OracleSafe
# documents (on the object's scaladoc) exactly which hostility classes
# keep a DuckDB value-compare meaningful and which oracle forces each
# constraint; everything beyond that profile is covered in-JVM by
# RelationalFuzzSpec.
#
# Usage: tools/fuzz_gate.sh <seed> [workdir]
set -euo pipefail
SEED="${1:?seed}"
WORK="${2:-/tmp/graft_fuzz_gate}"
SF_DIR="$WORK/tables_$SEED"
OUT_DIR="$WORK/out_$SEED"
mkdir -p "$WORK"
rm -rf "$SF_DIR" "$OUT_DIR"
cd "$(dirname "$0")/.."
sbt -batch "Test/runMain graft.fuzz.FuzzGen $SEED $SF_DIR" >"$WORK/gen_$SEED.log" 2>&1
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >"$WORK/verify_$SEED.log" 2>&1 || true
grep "\[verify\]" "$WORK/verify_$SEED.log" || true
python3 tools/compare_oracle.py "$SF_DIR" "$OUT_DIR"
