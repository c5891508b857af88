#!/usr/bin/env bash
# sbt-FREE graft.Verify launch (r12 verdict #1): plain `java -cp` over the
# committed dist/graft.jar + /opt/spark/jars, so a correctness sweep can
# NEVER collide with the sbt target-dir lock (the r09/r10/r12 failure mode
# that voided CORRECTNESS_r{N}.json to `{}`).
#
# Usage: tools/verify.sh <sfDir> <outDir> [queryName ...]
# Exit: 0 + "DUMP OK: …" on a structurally complete dump;
#       2 + "DUMP INCOMPLETE: …" if any query failed or is missing;
#       3 if dist/graft.jar is STALE relative to src/main (rebuild with
#         tools/build_jar.sh — requires the sbt lock, run it at closeout).
set -euo pipefail
here="$(cd "$(dirname "$0")/.." && pwd)"
jar="$here/dist/graft.jar"
if [[ ! -f "$jar" ]]; then
  echo "DUMP INCOMPLETE: $jar missing — run tools/build_jar.sh" >&2
  exit 3
fi
stale=$(find "$here/src/main" -name '*.scala' -newer "$jar" | head -3)
if [[ -n "$stale" ]]; then
  echo "DUMP INCOMPLETE: dist/graft.jar is stale (newer sources:" >&2
  echo "$stale" >&2
  echo ") — run tools/build_jar.sh first" >&2
  exit 3
fi
addopens=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  addopens="$addopens --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $addopens \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$jar:/opt/spark/jars/*" \
  graft.Verify "$@"
