#!/bin/bash
# Full Verify + selfcheck at all three SFs -> /tmp/r8final_*
set -e
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for sf in 0.001 0.01 0.1; do
  out=/tmp/r8final_$sf
  rm -rf $out
  SPARK_GRAFT_CPUS=16 java $OPENS -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Verify /root/testdata/sf$sf $out > /tmp/r8final_verify_$sf.log 2>&1
  python3 /root/repo/tools/selfcheck.py /root/testdata/sf$sf $out > /tmp/r8final_check_$sf.log 2>&1 || true
  echo "=== sf$sf done: $(grep -c PASS /tmp/r8final_check_$sf.log) PASS, $(grep -c FAIL /tmp/r8final_check_$sf.log) FAIL"
done
