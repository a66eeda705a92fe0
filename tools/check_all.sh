#!/bin/bash
# Full local gate: compile, test, oracle-verify at sf0.01, bench at sf0.1.
set -eo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile test
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
python3 tools/check_oracle.py /tmp/graft_verify /root/testdata/sf0.01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | grep -oE '\{"metric".*' | tail -1
