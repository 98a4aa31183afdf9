#!/bin/sh
# Pre-commit gate for registry changes (round-6 verdict item 2).
#
# Usage:
#   scripts/precommit.sh                 # full registry under the VANILLA session
#   scripts/precommit.sh q1,q2,...       # just the named queries, all three sessions
#
# The vanilla session (bare SparkSession: Arrow off, default confs) is the
# environment class the real driver gate runs; driver_sim/hostile_sim catch
# value bugs, vanilla catches conf-sensitivity (the stream_job_queue class).
set -e
cd "$(dirname "$0")/.."
# Streaming gate rows must pass via their STREAMING path in the sims —
# no silent batch-twin fallback (round-6 verdict item 1).
NEURONDB_STRICT_STREAM=1
export NEURONDB_STRICT_STREAM
SF=${SPARK_GRAFT_SF_DIR_SMALL:-/root/testdata/sf0.01}
if [ -n "$1" ]; then
  python scripts/driver_sim.py "$SF" "$1"
  python scripts/vanilla_sim.py "$SF" "$1"
  python scripts/hostile_sim.py "$SF" "$1"
else
  python scripts/vanilla_sim.py "$SF"
fi
echo "precommit gate: OK"
