#!/bin/bash
# Cross-JVM multi-writer race harness for graft.tools.MultiWriterProbe:
# launches REAL concurrent driver JVMs (spark-submit, one SparkSession
# each) against a shared index baseDir. Three scenarios; each must land
# bit-identically on its reference tree (see the probe's scaladoc).
#
# Usage: tools/multiwriter_race.sh [sfDir]
# Needs: sbt -batch package  (target/scala-2.13/graphiquespark_2.13-0.1.0.jar)
set -u
SF="${1:-/root/testdata/sf0.01}"
JAR=target/scala-2.13/graphiquespark_2.13-0.1.0.jar
SUBMIT=/opt/spark/bin/spark-submit
RUN() { # RUN <logfile> <probe-args...>
  local log="$1"; shift
  "$SUBMIT" --master 'local[8]' --driver-memory 6g \
    --conf spark.ui.enabled=false \
    ${STALE_MS:+--conf spark.driver.extraJavaOptions=-Dgraft.index.append.claim.stale.ms=$STALE_MS} \
    --class graft.tools.MultiWriterProbe "$JAR" "$@" >"$log" 2>&1
}
await_ready() { # await_ready <work> <who...>
  local work="$1"; shift
  for who in "$@"; do
    while [ ! -e "$work/ready_$who" ]; do sleep 0.2; done
  done
  touch "$work/go"
}
fail=0
verdict() { # verdict <scenario> <checklog>
  if grep -q "PROBE MULTIWRITER PASS" "$2"; then echo "SCENARIO $1: PASS"
  else echo "SCENARIO $1: FAIL"; grep "PROBE" "$2" | tail -12; fail=1; fi
}

# 1. same-segment race: two JVMs, same deterministic id, full segment
W=/tmp/mwrace_same; rm -rf "$W"; mkdir -p "$W"
RUN /tmp/mw_setup1.log setup "$W" "$SF"
RUN /tmp/mw_a1.log append "$W" A full & PA=$!
RUN /tmp/mw_b1.log append "$W" B full & PB=$!
await_ready "$W" A B
wait $PA $PB
RUN /tmp/mw_check1.log check "$W" ref1
grep "PROBE append" /tmp/mw_a1.log /tmp/mw_b1.log
verdict same-segment /tmp/mw_check1.log

# 2. different-segment concurrency: both halves must land
W=/tmp/mwrace_diff; rm -rf "$W"; mkdir -p "$W"
RUN /tmp/mw_setup2.log setup "$W" "$SF"
RUN /tmp/mw_a2.log append "$W" A a & PA=$!
RUN /tmp/mw_b2.log append "$W" B b & PB=$!
await_ready "$W" A B
wait $PA $PB
RUN /tmp/mw_check2.log check "$W" ref2
grep "PROBE append" /tmp/mw_a2.log /tmp/mw_b2.log
verdict different-segment /tmp/mw_check2.log

# 3. crashed-claim takeover: planted claim, lowered stale bound, one appender
W=/tmp/mwrace_crash; rm -rf "$W"; mkdir -p "$W"
RUN /tmp/mw_setup3.log setup "$W" "$SF"
RUN /tmp/mw_plant.log plant-claim "$W"
sleep 6   # age the claims past the lowered stale bound
STALE_MS=5000 RUN /tmp/mw_a3.log append "$W" A full & PA=$!
await_ready "$W" A
wait $PA
RUN /tmp/mw_check3.log check "$W" ref1
grep "PROBE append" /tmp/mw_a3.log
verdict crashed-claim-takeover /tmp/mw_check3.log

exit $fail
