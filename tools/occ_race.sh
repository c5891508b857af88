#!/usr/bin/env bash
# CROSS-PROCESS OCC race (r13 verdict "What's missing" #3): two plain
# `java -cp dist/graft.jar` JVMs race tryCommit / tryAppendAt /
# appendBatch against ONE estate dir; a third invocation re-derives every
# invariant from the committed manifests, and this script cross-counts
# the per-slot winner lines from both racers' stdout (exactly one
# `slotK=true` across the two processes, exactly one `appendAt2=true`).
#
# Usage: tools/occ_race.sh [estateDir]   (default: a fresh /tmp dir)
# Exit: 0 + "OCCRACE PASS" only when every invariant holds.
set -euo pipefail
here="$(cd "$(dirname "$0")/.." && pwd)"
jar="$here/dist/graft.jar"
[[ -f "$jar" ]] || { echo "OCCRACE FAIL: $jar missing — tools/build_jar.sh" >&2; exit 3; }
estate="${1:-/tmp/graft_occrace_$$}"
rm -rf "$estate"; mkdir -p "$estate"

addopens=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  addopens="$addopens --add-opens=java.base/$p=ALL-UNNAMED"
done
run() {
  java $addopens -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx2g \
    -cp "$jar:/opt/spark/jars/*" graft.OccRace "$@"
}

run seed "$estate"
run race "$estate" A >"$estate/a.log" 2>&1 &
pa=$!
run race "$estate" B >"$estate/b.log" 2>&1 &
pb=$!
# release the start barrier only once both JVMs are warmed up and polling
for _ in $(seq 1 600); do
  [[ -f "$estate/.ready.A" && -f "$estate/.ready.B" ]] && break
  sleep 0.2
done
[[ -f "$estate/.ready.A" && -f "$estate/.ready.B" ]] || {
  echo "OCCRACE FAIL: racers never reached the barrier" >&2; exit 1; }
touch "$estate/.go"
wait "$pa" "$pb"

# cross-count the winner lines: exactly one true per raced slot
python3 - "$estate" <<'EOF'
import sys, re, pathlib
estate = pathlib.Path(sys.argv[1])
lines = (estate/"a.log").read_text() + (estate/"b.log").read_text()
fails = []
for k in range(1, 9):
    wins = len(re.findall(rf"slot{k}=true\b", lines))
    if wins != 1:
        fails.append(f"slot{k}: {wins} winners (expected 1)")
wins = len(re.findall(r"appendAt2=true\b", lines))
if wins != 1:
    fails.append(f"appendAt2: {wins} winners (expected 1)")
vs = sorted(int(v) for v in re.findall(r"appendBatch_v=(\d+)", lines))
if vs != [3, 4]:
    fails.append(f"appendBatch versions {vs} != [3, 4] (loser must rebase)")
if fails:
    print("OCCRACE FAIL (stdout cross-count):", "; ".join(fails))
    sys.exit(1)
print("[occ] stdout cross-count ok: 8 slots one winner each, "
      "appendAt2 one winner, appendBatch rebased to [3, 4]")
EOF

# operation-level race: both processes run the FULL buildIvfIndex
# against one root (train + stage + commit), then serve — the estate
# operation the primitives exist for
dataset="${GRAFT_OCC_DATASET:-/root/testdata/sf0.001}"
run ivf "$estate" A "$dataset" >"$estate/ivf_a.log" 2>&1 &
pa=$!
run ivf "$estate" B "$dataset" >"$estate/ivf_b.log" 2>&1 &
pb=$!
for _ in $(seq 1 600); do
  [[ -f "$estate/.ready2.A" && -f "$estate/.ready2.B" ]] && break
  sleep 0.2
done
[[ -f "$estate/.ready2.A" && -f "$estate/.ready2.B" ]] || {
  echo "OCCRACE FAIL: ivf racers never reached the barrier" >&2; exit 1; }
touch "$estate/.go2"
wait "$pa" "$pb"
hashes=$(grep -h "ivf_serve_hash=" "$estate/ivf_a.log" "$estate/ivf_b.log" \
  | sed 's/.*ivf_serve_hash=//' | sort -u)
if [[ $(echo "$hashes" | wc -l) -ne 1 ]]; then
  echo "OCCRACE FAIL: racing builders served different results: $hashes"
  exit 1
fi
echo "[occ] ivf build race: both processes serve identical results"

run verify "$estate"
