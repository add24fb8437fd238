#!/bin/bash
# Honest-cluster smoke: 2 executor JVMs x 16 cores via local-cluster.
# Usage: tools/cluster_smoke.sh [sfDir] [queryName...]   (default sf0.01, default query list)
set -e
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/*.jar | head -1)
SF="${1:-/root/testdata/sf0.01}"
if [ $# -gt 0 ]; then shift; fi
SPARK_GRAFT_SF_DIR="$SF" /opt/spark/bin/spark-submit \
  --class graft.ClusterSmoke \
  --master "local-cluster[2,16,8192]" \
  --conf spark.executor.memory=8g \
  "$JAR" "$@"
