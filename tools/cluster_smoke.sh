#!/bin/bash
# Honest-cluster smoke: 2 executor JVMs x 16 cores via local-cluster.
# Usage: tools/cluster_smoke.sh [sfDir]   (default sf0.01)
set -e
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/*.jar | head -1)
SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.01}" /opt/spark/bin/spark-submit \
  --class graft.ClusterSmoke \
  --master "local-cluster[2,16,8192]" \
  --conf spark.executor.memory=8g \
  "$JAR"
