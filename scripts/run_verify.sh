#!/usr/bin/env bash
# Run graft.Verify directly on the compiled classes (no sbt startup):
#   scripts/run_verify.sh <sfDir> <outDir> [queryName ...]
# Env: SPARK_GRAFT_CPUS (threads AND shuffle.partitions, default 4),
#      SPARK_DRIVER_MEM (default 16g).
# Used for the partition-count invariance sweep (SURVEY §7.11):
#   SPARK_GRAFT_CPUS=32 scripts/run_verify.sh sfDir outA && check.py ...
#   SPARK_GRAFT_CPUS=4  scripts/run_verify.sh sfDir outB && check.py ...
#
# STANDING ROUND-CLOSE GATE (round-17 ask #2):
#   scripts/run_verify.sh --two-scale
# runs the FULL catalog at BOTH sf0.01 and sf0.1, oracle-checks each
# with scripts/check.py, prints the fixed ledger line
#   two-scale: PASS n/PASS n
# and exits non-zero if either scale has a failure. Rationale:
# absolute-threshold and sketch-bound queries have diverged between
# scale factors before, and a single-SF sweep cannot see it — run this
# before every round close and record the printed line in the SURVEY §7
# ledger entry. Outputs land in /tmp/verify_twoscale_sf{0.01,0.1}.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_verify() {
  java $ADD_OPENS \
    -Xmx"${SPARK_DRIVER_MEM:-16g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Verify "$@"
}

if [[ "${1:-}" == "--two-scale" ]]; then
  summary=""
  rc=0
  for sf in sf0.01 sf0.1; do
    out="/tmp/verify_twoscale_${sf}"
    rm -rf "$out"
    echo "two-scale: sweeping $sf ..." >&2
    run_verify "/root/testdata/$sf" "$out" >/dev/null
    # check.py exits 1 on any FAIL — that is the adjudication below, so
    # it must not trip set -e/pipefail here (it would kill the script
    # BEFORE the ledger line prints, exactly when there is a failure to
    # report)
    line=$(python3 scripts/check.py "/root/testdata/$sf" "$out" | tail -1) \
      || true
    # check.py's last line is "PASS n FAIL m"
    fails=$(sed -E 's/.*FAIL ([0-9]+).*/\1/' <<<"$line")
    if [[ "$fails" != "0" ]]; then
      rc=1
      summary+="${summary:+/}${line} (${sf})"
    else
      summary+="${summary:+/}$(sed -E 's/ FAIL 0//' <<<"$line")"
    fi
  done
  # round-20 low-cardinality sentinel (VERDICT r19 #5): a query whose
  # result SHRINKS to <=2 rows at the larger SF is the §7.10 degeneracy
  # class decaying toward zero — catch it before the zero-row gate
  # would. rc 1 = real suspects; anything else (rc 2 unusable dirs, a
  # crash) is an infrastructure failure and must be LABELED as such,
  # not dressed up as a finding
  trc=0
  python3 scripts/rowtrend.py /tmp/verify_twoscale_sf0.01 \
    /tmp/verify_twoscale_sf0.1 || trc=$?
  if [[ $trc -eq 0 ]]; then
    summary+=" trend CLEAN"
  elif [[ $trc -eq 1 ]]; then
    rc=1
    summary+=" trend SUSPECT (see rowtrend line above)"
  else
    rc=1
    summary+=" trend UNUSABLE (rowtrend rc $trc)"
  fi
  echo "two-scale: $summary"
  exit $rc
fi

# no exec: run_verify is a shell function (exec only takes real
# commands); set -e propagates the JVM's exit code as this script's
run_verify "$@"
