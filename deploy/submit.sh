#!/bin/bash
# Cluster submission for citegraph_spark (parity with the reference's
# submit.sh, reference submit.sh:1-23, re-expressed for a PySpark app).
#
# USAGE
#   submit.sh <spark_master_uri> <task> <input_dir> <output_dir> [extra spark-submit args...]
# EXAMPLE
#   submit.sh spark://master:7077 density hdfs://nn:8020/citegraph/data hdfs://nn:8020/citegraph/output
#   submit.sh yarn diameter s3a://bucket/citegraph/data s3a://bucket/citegraph/output --num-executors 1000
#
# Any Spark master works (spark://, yarn, k8s://); any Hadoop-compatible
# filesystem URI works for data (the CLI does not require hdfs:// —
# unlike the reference, Application.scala:34-36). Cluster deploy-mode is
# the default, matching the reference; pass --deploy-mode client after
# the four positionals to override.

set -euo pipefail

if [[ $# -lt 4 ]]; then
  echo "USAGE: submit.sh <spark_master_uri> <density|diameter> <input_dir> <output_dir> [spark-submit args...]" >&2
  exit 1
fi

SPARK_MASTER_URI=$1; TASK=$2; INPUT_DIR=$3; OUTPUT_DIR=$4; shift 4

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

# Ship the package to executors as a zip (Pandas-UDF/mapInPandas stages
# import citegraph_spark worker-side).
PYZIP="$(mktemp -d)/citegraph_spark.zip"
(cd "$REPO_DIR" && zip -qr "$PYZIP" citegraph_spark)

exec "${SPARK_HOME:?SPARK_HOME not set}"/bin/spark-submit \
  --master "$SPARK_MASTER_URI" \
  --deploy-mode cluster \
  --properties-file "$REPO_DIR/deploy/spark-cluster.conf" \
  --py-files "$PYZIP" \
  "$@" \
  "$REPO_DIR/deploy/cluster_entry.py" "$TASK" "$INPUT_DIR" "$OUTPUT_DIR"
