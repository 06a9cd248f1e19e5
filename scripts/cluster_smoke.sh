#!/usr/bin/env bash
# Multi-JVM execution validation (ROADMAP #1): run the FULL correctness
# suite against a real Spark standalone cluster on this box — separate
# master, worker, and executor JVMs — instead of local[n]. This is the
# execution mode local[n] cannot test: closure/expression serialization
# (every custom Catalyst expression and Nondeterministic sampler must
# survive a real serialize->ship->deserialize round trip), netty shuffle
# and broadcast transport between processes, and per-executor heaps
# (SCALING.md's "heap-per-core is the binding resource" finding).
#
# Usage: scripts/cluster_smoke.sh [sfDir] [outDir]
#   WORKERS (default 2), WORKER_CORES (default 8), EXEC_MEM (default 12g)
#   KEEP_CLUSTER=1 leaves the daemons up for iterating.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_cluster_smoke}
WORKERS=${WORKERS:-2}
WORKER_CORES=${WORKER_CORES:-8}
WORKER_MEM=${WORKER_MEM:-16g}
EXEC_MEM=${EXEC_MEM:-12g}
MASTER_URL="spark://127.0.0.1:7077"
# Workers spawn executor JVMs through the Spark launcher, which resolves
# the executor classpath from SPARK_HOME ("Cannot find any build
# directories" without it).
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
# bare-java daemons skip load-spark-env.sh, which normally derives this;
# without it the launcher probes source-build directories and dies with
# "Cannot find any build directories"
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
OPTS=$(grep '^OPTS' scripts/run_verify_sf1.sh | cut -d'"' -f2)
JAR=$(ls -t target/scala-2.13/*.jar | head -1)
[[ -n "$JAR" ]] || { echo "no jar — run: sbt package"; exit 1; }
JAR=$(readlink -f "$JAR")
# Fail fast if compiled classes are newer than the jar: executors load the
# jar, and a stale one would silently diverge from a classes-dir driver.
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

echo "== Verify on $MASTER_URL ($SF) =="
# total shuffle parallelism = workers x cores; our classes ship via
# spark.jars; executor JVMs get the same --add-opens set via
# spark.executor.extraJavaOptions (Java 17 + Spark's serializers).
SPARK_GRAFT_MASTER="$MASTER_URL" \
SPARK_GRAFT_CPUS=$((WORKERS * WORKER_CORES)) \
java -Xmx8g $OPTS \
  -Dspark.jars="file:$JAR" \
  -Dspark.executor.memory="$EXEC_MEM" \
  -Dspark.executor.extraJavaOptions="$OPTS" \
  -Dspark.ui.enabled=false \
  -cp "$JAR:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT"

echo "== DuckDB compare =="
python3 scripts/compare.py "$SF" "$OUT"
echo "== cluster smoke green: $WORKERS workers x $WORKER_CORES cores, executor mem $EXEC_MEM =="
