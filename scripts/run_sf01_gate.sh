#!/usr/bin/env bash
# Reproducible FULL-INVENTORY sf0.1 correctness gate — r12 verdict ask #1.
#
# The sf0.01 driver gate checks every query each round; the sf1.0 gate
# checks the scale-sensitive families at 10x. This middle gate runs the
# ENTIRE SparkEntry inventory (no name filter) against DuckDB at sf0.1,
# writing CORRECTNESS_sf0.1.json at the repo root with the same
# gate_fingerprint staleness stamp as run_sf1_gate.sh, so the artifact
# can never silently describe a different query set than the tree holds.
#
# Expected wall time on the local[32] box: ~18 min Spark dump + ~60 min
# DuckDB check (d06's composed connected-components oracle alone is
# ~45 min; then d17/t36). Run it detached, never on the critical path,
# and keep it OFF the bench-timing window (it saturates the box).
#
# Runs the dump from a SNAPSHOT of the compiled classes, not sbt runMain:
# Spark loads classes lazily, so a concurrent `sbt compile` would
# otherwise swap classfiles under the running JVM mid-dump.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${SF0_1_DIR:-/root/testdata/sf0.1}
OUT=${SF01_OUT:-target/verify_sf01}
JSON=${SF01_JSON:-CORRECTNESS_sf0.1.json}

# Full inventory: the fingerprint covers every source that defines
# queries, oracles or fixtures (post-split: the per-family registries
# and shared helpers, not only the SparkEntry facade).
fingerprint() {
  cat src/main/scala/graft/functions/*.scala \
      src/main/scala/graft/SparkEntry.scala \
      src/main/scala/graft/Entries*.scala \
      src/main/scala/graft/EntryHelpers.scala \
      src/main/scala/graft/TpchSuite.scala \
    | sha256sum | cut -d' ' -f1
}
FP=$(fingerprint)

if [ "${1:-}" = "check" ]; then
  if [ ! -f "$JSON" ]; then
    echo "[sf0.1-gate] STALE: no $JSON artifact exists" >&2; exit 2
  fi
  STORED=$(python3 -c "import json,sys; print(json.load(open(sys.argv[1])).get('gate_fingerprint',''))" "$JSON")
  if [ "$STORED" = "$FP" ]; then
    echo "[sf0.1-gate] FRESH: $JSON matches the current query/oracle sources ($FP)"
    exit 0
  fi
  echo "[sf0.1-gate] STALE: $JSON was dumped from different sources (stored ${STORED:-<none>}, current $FP) — re-run the gate" >&2
  exit 2
fi

ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

# compile UNCONDITIONALLY: snapshotting stale classes would verify old
# bytecode while stamping the fingerprint of the NEW sources, making
# `check` report FRESH for an artifact that never exercised the current
# code (review finding). Do not start the gate while another forked
# runMain JVM is alive — this compile would swap classes under it.
echo "[sf0.1-gate] compiling..." >&2
sbt -batch compile

SNAP=$(mktemp -d /tmp/graft_gate01_classes.XXXXXX)
trap 'rm -rf "$SNAP"' EXIT
cp -r target/scala-2.13/classes/. "$SNAP/"

echo "[sf0.1-gate] dumping the FULL query inventory at sf0.1..." >&2
# shellcheck disable=SC2086
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" graft.Verify "$SRC" "$OUT"

echo "[sf0.1-gate] DuckDB differential (d06 dominates; ~60 min)..." >&2
python3 scripts/check_correctness.py "$SRC" "$OUT" --json "$JSON"

FP_END=$(fingerprint)
if [ "$FP_END" != "$FP" ]; then
  echo "[sf0.1-gate] WARNING: query/oracle sources changed mid-gate — artifact stamped stale" >&2
  FP="stale-sources-changed-mid-gate"
fi
python3 -c "
import json, sys
p, fp = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d['gate_fingerprint'] = fp
json.dump(d, open(p, 'w'), indent=1)
" "$JSON" "$FP"
echo "[sf0.1-gate] stamped gate_fingerprint=$FP into $JSON" >&2
