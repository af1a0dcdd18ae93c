#!/usr/bin/env bash
# min-of-N timing of single driver entries via a throwaway Bench-like loop
# usage: tools/timequery.sh <sfDir> <iters> <q1,q2,...>
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
OPENS=$(for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do echo --add-opens $p=ALL-UNNAMED; done)
java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.TimeQuery "$@"
