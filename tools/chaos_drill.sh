#!/bin/bash
# Executor-loss drill: run a17's whole warehouse loop under
# local-cluster[2,16], halt one executor JVM mid-drain, assert the
# warehouse contents hash-match the clean run (graft.ClusterChaos).
# Usage: tools/chaos_drill.sh [sfDir]   (default sf0.01)
set -e
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests' | head -1)
SF="${1:-/root/testdata/sf0.01}"
SPARK_GRAFT_SF_DIR="$SF" /opt/spark/bin/spark-submit \
  --class graft.ClusterChaos \
  --master "local-cluster[2,16,8192]" \
  --conf spark.executor.memory=8g \
  "$JAR"
