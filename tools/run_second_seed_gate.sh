#!/bin/bash
# Second-seed oracle gate (driver-side tooling; NOT part of the library).
#
# Every driver CORRECTNESS pass is conditioned on the single seed-42
# data draw — ties, round boundaries, quantile cut points, LIMIT
# tie-breaks and forced-zero cancellations all sit where that one draw
# put them. This gate re-runs the ENTIRE oracle pipeline on a fresh
# draw (schema-identical, different seed), structurally killing the
# passes-by-data-luck class the same way check_oracle_types.py killed
# the type-parity class. On its first r12 run it caught three latent
# splits seed-42 never reached: tpch_q2 (round4 half-case on the
# cents/quantity grid), ts_bollinger (round6 half-case on the fixed
# 24-hour window denominator), ml_qini (DuckDB -0.0 vs Spark 0.0 at
# the qini curve's forced-zero endpoint).
#
# Default SF is 0.05 (r13, per the r12 verdict): BOTH r12 discovery
# classes that needed more than a new seed (ts_bollinger's fixed
# denominator, tpch_q9's e4-grid revenue sums) first fired at sf0.05 —
# more groups hit more boundary cells. Pass 0.01 for a quick draw.
#
# Usage: tools/run_second_seed_gate.sh [SEED] [SF]   (from repo root)
set -e
SEED="${1:-43}"
SF="${2:-0.05}"
DIR="testdata_alt/seed${SEED}_sf${SF}"
OUT="/tmp/graft_verify_seed${SEED}"
python3 tools/gen_testdata.py "$DIR" --seed "$SEED" --sf "$SF"
rm -rf "$OUT"
LOG=$(mktemp)
sbt -batch "runMain graft.Verify $PWD/$DIR $OUT" >"$LOG" 2>&1 || {
  tail -20 "$LOG"; exit 1; }
if grep "\[verify\].*failed" "$LOG"; then
  echo "Verify reported per-query failures"; exit 1
fi
python3 tools/check_oracle.py "$PWD/$DIR" "$OUT"
python3 tools/check_oracle_types.py "$PWD/$DIR" "$OUT"
python3 tools/check_negzero.py "$PWD/$DIR" "$OUT"
echo "second-seed gate (seed=$SEED sf=$SF): ALL OK"
