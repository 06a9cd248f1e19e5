#!/usr/bin/env bash
# Cluster-mode benchmark (ROADMAP #1 extension): run the headline bench
# against the same standalone master+workers cluster_smoke.sh validates
# correctness on, so the timed path crosses real JVM boundaries (executor
# launch, closure/expression serialization, netty shuffle + broadcast
# transport) instead of local[n]'s in-process block moves. Compare the
# resulting total to the committed local-mode record in
# bench_summary.json: parity within noise means no hidden
# local-mode-only cheat (e.g. an operator that would serialize horribly,
# or a broadcast that only works in-process).
#
# Usage: scripts/cluster_bench.sh [sfDir]
#   WORKERS (default 2), WORKER_CORES (default 8), EXEC_MEM (default 12g)
#   SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts entries (dev loop).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
WORKERS=${WORKERS:-2}
WORKER_CORES=${WORKER_CORES:-8}
WORKER_MEM=${WORKER_MEM:-16g}
EXEC_MEM=${EXEC_MEM:-12g}
MASTER_URL="spark://127.0.0.1:7077"
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
OPTS=$(grep '^OPTS' scripts/run_verify_sf1.sh | cut -d'"' -f2)
JAR=$(ls -t target/scala-2.13/*.jar | head -1)
[[ -n "$JAR" ]] || { echo "no jar — run: sbt package"; exit 1; }
JAR=$(readlink -f "$JAR")
# Driver and executors must run the SAME code: the driver classpath uses
# the jar (below), and we fail fast if any compiled class is newer than
# the jar — a stale jar would ship old expressions/closures to executors
# while a classes-dir driver silently ran newer ones.
NEWER=$(find target/scala-2.13/classes -name '*.class' -newer "$JAR" | head -1)
if [[ -n "$NEWER" ]]; then
  echo "classes are newer than $JAR (e.g. $NEWER) — run: sbt package"; exit 1
fi

cleanup() {
  if [[ "${KEEP_CLUSTER:-0}" != "1" ]]; then
    pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null || true
    pkill -f org.apache.spark.deploy.master.Master 2>/dev/null || true
  fi
}
trap cleanup EXIT

if ! pgrep -f org.apache.spark.deploy.master.Master >/dev/null; then
  echo "== starting master =="
  nohup java $OPTS -cp "/opt/spark/jars/*" -Dspark.master.rest.enabled=false \
    org.apache.spark.deploy.master.Master --host 127.0.0.1 --port 7077 \
    --webui-port 0 > /tmp/spark_master.log 2>&1 &
  sleep 6
  grep -q "started service 'sparkMaster'" /tmp/spark_master.log \
    || { cat /tmp/spark_master.log; exit 1; }
fi
if ! pgrep -f org.apache.spark.deploy.worker.Worker >/dev/null; then
  echo "== starting $WORKERS workers ($WORKER_CORES cores, $WORKER_MEM) =="
  for i in $(seq 1 "$WORKERS"); do
    nohup java $OPTS -cp "/opt/spark/jars/*" \
      org.apache.spark.deploy.worker.Worker "$MASTER_URL" --host 127.0.0.1 \
      --cores "$WORKER_CORES" --memory "$WORKER_MEM" --webui-port 0 \
      --work-dir "/tmp/spark_work_$i" > "/tmp/spark_worker_$i.log" 2>&1 &
  done
  sleep 8
  for i in $(seq 1 "$WORKERS"); do
    grep -q "Successfully registered" "/tmp/spark_worker_$i.log" \
      || { cat "/tmp/spark_worker_$i.log"; exit 1; }
  done
fi

echo "== Bench on $MASTER_URL ($SF) =="
# record files go to /tmp: bench_summary.json at the repo root is the
# LOCAL quiet-box canonical record (commit_round.sh convention) and a
# cluster run must not overwrite it — cluster results are recorded in
# SCALING.md ("cluster-mode bench") instead.
SPARK_GRAFT_BENCH_SUMMARY=/tmp/cluster_bench_summary.json \
SPARK_GRAFT_BENCH_FULL=/tmp/cluster_bench_full.json \
SPARK_GRAFT_MASTER="$MASTER_URL" \
SPARK_GRAFT_SF_DIR="$SF" \
SPARK_GRAFT_CPUS=$((WORKERS * WORKER_CORES)) \
java -Xmx8g $OPTS \
  -Dspark.jars="file:$JAR" \
  -Dspark.executor.memory="$EXEC_MEM" \
  -Dspark.executor.extraJavaOptions="$OPTS" \
  -Dspark.ui.enabled=false \
  -cp "$JAR:/opt/spark/jars/*" \
  graft.Bench
echo "== cluster bench done: $WORKERS workers x $WORKER_CORES cores, executor mem $EXEC_MEM =="
