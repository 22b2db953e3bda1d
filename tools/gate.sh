#!/usr/bin/env bash
# Full local replica of the driver's round gate, one command:
#   tools/gate.sh            # tests + oracle gate at all three SFs + bench
#   tools/gate.sh quick      # tests + oracle gate at sf0.01 only
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
sbt -batch test | grep -E "Tests:|All tests"

sfs="sf0.001 sf0.01 sf0.1"
[ "${1:-}" = "quick" ] && sfs="sf0.01"
for sf in $sfs; do
  echo "== oracle gate $sf =="
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/$sf /tmp/graft_gate_$sf" >/dev/null
  python3 tools/check.py "/root/testdata/$sf" "/tmp/graft_gate_$sf" | tail -1
done

if [ "${1:-}" != "quick" ]; then
  echo "== bench sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" | grep -F '"metric"'
fi
