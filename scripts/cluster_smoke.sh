#!/bin/bash
# r16 (VERDICT r15 #6): CheckpointPolicy durability smoke on a REAL
# multi-JVM master (local-cluster[2,2,2048] through the /opt/spark
# distribution). See graft.ProbeClusterSmoke for the legs.
set -e
cd "$(dirname "$0")/.."
# the standalone launcher's executor command builder cannot infer the
# scala version outside bin/spark-class (throws "Cannot find any build
# directories") — pin it
export SPARK_SCALA_VERSION=2.13
exec java -Xmx4g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ProbeClusterSmoke "$@"
