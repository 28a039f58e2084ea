#!/bin/bash
# A/B bench: r4 (9db7af0, worktree target/abr4) vs r5 (HEAD classes),
# interleaved ABAB in one quiet session, identical JVM flags (mirrors
# build.sbt javaOptions). Writes one JSON line per run to target/ab/.
set -eu
cd /root/repo
mkdir -p target/ab
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
JOPTS="$ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
R4CP="target/abr4/target/scala-2.13/classes:/opt/spark/jars/*"
R5CP="target/scala-2.13/classes:/opt/spark/jars/*"
for i in 1 2; do
  for v in r4 r5; do
    if [ "$v" = r4 ]; then CP="$R4CP"; else CP="$R5CP"; fi
    echo "=== $v run $i start $(date +%T) ==="
    java $JOPTS -cp "$CP" graft.Bench 2>target/ab/${v}_${i}.err | tail -1 > target/ab/${v}_${i}.json
    echo "=== $v run $i done $(date +%T) ==="
  done
done
echo ALL_DONE
