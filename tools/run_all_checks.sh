#!/bin/bash
# One-command reproduction of every round gate, in order:
#   1. pytest suite (unit + golden + property + plan-audit + resume)
#   2. Spark-vs-DuckDB oracle parity at sf0.01 (the driver's gate)
#   3. bench.py (throughput + attached scaling evidence)
# Optional slow extras (pass --full): sf0.001 oracle parity, the
# two-parallelism scaling run, and the multi-executor scaling run.
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle parity (sf0.01) =="
python tools/check_oracles.py /root/testdata/sf0.01

echo "== bench =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py

if [ "$1" = "--full" ]; then
    echo "== oracle parity (sf0.001) =="
    python tools/check_oracles.py /root/testdata/sf0.001
    echo "== scaling local[8] vs local[32] =="
    python bench_scaling.py 32768 /tmp/scaling_8_32.json 8 32
    echo "== scaling 1 vs 4 executors (local-cluster) =="
    python bench_scaling_cluster.py 32768 /tmp/scaling_lc.json 1 2
fi
echo "ALL CHECKS PASSED"
