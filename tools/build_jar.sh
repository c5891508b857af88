#!/usr/bin/env bash
# Rebuild the sbt-free launch jar (dist/graft.jar) from HEAD sources.
# Needs the sbt target lock — run at closeout, never concurrently with
# another sbt process. tools/verify.sh refuses a stale jar, so forgetting
# this step fails loudly instead of dumping stale results.
set -euo pipefail
here="$(cd "$(dirname "$0")/.." && pwd)"
cd "$here"
sbt -batch package
mkdir -p dist
cp target/scala-2.13/datacollectionieeespark_2.13-0.1.0.jar dist/graft.jar
echo "dist/graft.jar rebuilt: $(stat -c '%y %s bytes' dist/graft.jar)"
