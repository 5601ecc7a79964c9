"""spark-submit entry point for cluster runs.

Thin wrapper over citegraph_spark.cli so the same argument contract
works under `spark-submit --deploy-mode cluster` (reference
submit.sh:17-20 submits org.citegraph.Application the same way). The
session is created by spark-submit; cli.get_spark() picks it up via
getOrCreate, with --properties-file (deploy/spark-cluster.conf)
supplying the cluster-scale configuration instead of the local[N]
defaults in citegraph_spark/session.py.
"""

from __future__ import annotations

import os
import sys

try:
    from citegraph_spark import cli
except ModuleNotFoundError:
    # client-mode smoke runs from a checkout: the package sits one level
    # above this file (cluster mode gets it via --py-files instead)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from citegraph_spark import cli

if __name__ == "__main__":
    sys.exit(cli.main(sys.argv[1:]))
