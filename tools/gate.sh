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
  # BENCH_SF parameterizes the whole bench leg (dir, delta report,
  # committed artifact names) — a non-default SF no longer mislabels
  # its evidence as sf0.1
  bsf="${BENCH_SF:-sf0.1}"
  echo "== bench $bsf =="
  # cold-cache accounting is MECHANICAL: the Verify legs above pre-warm
  # target/graft_cache in this workspace, so without this wipe run-1
  # never pays the artifact builds and the committed medians hide them.
  # Bench attributes each build to the query that paid it
  # (bench_builds_$bsf.json).  KEEP_GRAFT_CACHE=1 opts out for
  # deliberate warm-cache probes.
  [ "${KEEP_GRAFT_CACHE:-}" = "1" ] || rm -rf target/graft_cache
  SPARK_GRAFT_SF_DIR="/root/testdata/$bsf" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/graft_bench.log 2>&1 || true
  # Replicate the driver's parse: it keeps only the LAST 2000 chars and
  # reads the final JSON line out of them.  Six rounds came back
  # "parsed: null" because sbt decorated/trailed that line — this check
  # makes a local pass predict a driver parse.
  python3 - <<'EOF'
import json
tail = open('/tmp/graft_bench.log').read()[-2000:]
lines = [l for l in tail.splitlines() if l.startswith('{')]
assert lines, f"no bare JSON line in tail:\n{tail}"
last = tail.splitlines()[-1] if tail.splitlines()[-1].strip() else tail.splitlines()[-2]
assert last.startswith('{'), f"last tail line is not the JSON: {last!r}"
parsed = json.loads(lines[-1])
assert parsed.get('failed') == 0, f"bench reported failures: {parsed.get('failed')}"
q = parsed['queries']
n = q.get('n_queries', len(q)) if isinstance(q, dict) else 0
print(f"bench parsed OK: total={parsed['value']}s over {n} queries")
EOF
  # Round-over-round delta report BEFORE the medians file is
  # overwritten: every query moving >1.5x either way vs the previous
  # committed medians, alongside its fresh run-to-run spread — the
  # committed evidence that lets a regression be adjudicated
  # (plan change vs co-tenancy wobble) without judge-side archaeology.
  python3 - <<'EOF'
import json, os
bsf = os.environ.get('BENCH_SF', 'sf0.1')
if not (os.path.exists('target/bench_medians.json')
        and os.path.exists(f'bench_medians_{bsf}.json')):
    print('bench delta: no prior committed medians to diff — skipping')
else:
    prev = json.load(open(f'bench_medians_{bsf}.json'))
    cur = json.load(open('target/bench_medians.json'))
    spread = (json.load(open('target/bench_spread.json'))
              if os.path.exists('target/bench_spread.json') else {})
    moved = []
    for q in sorted(set(prev) | set(cur)):
        if q not in prev: moved.append((q, None, cur[q], 'new')); continue
        if q not in cur: moved.append((q, prev[q], None, 'gone')); continue
        lo, hi = sorted((prev[q], cur[q]))
        if lo > 0 and hi / lo > 1.5:
            moved.append((q, prev[q], cur[q], f'{cur[q]/prev[q]:.2f}x'))
    lines = [f'# Bench delta vs previous committed medians ({bsf})',
             '# query prev_s cur_s move spread_s  (>1.5x either way, plus new/gone)']
    for q, p, c, tag in moved:
        lines.append(f'{q} {p if p is not None else "-"} '
                     f'{c if c is not None else "-"} {tag} {spread.get(q, "-")}')
    if not moved:
        lines.append('(no query moved >1.5x)')
    open(f'bench_delta_{bsf}.txt', 'w').write('\n'.join(lines) + '\n')
    print('\n'.join(lines))
EOF
  # full per-query spread + ms-precision median maps → committed
  # evidence (the driver's tail window only fits a handful of entries,
  # at coarsened precision).  A successful bench whose diagnostics are
  # missing is itself a failure worth explaining, not a silent exit 1
  # from a dangling '&&'.
  for f in target/bench_spread.json target/bench_medians.json target/bench_telemetry.json target/bench_builds.json; do
    if [ ! -f "$f" ]; then
      echo "ERROR: bench succeeded but $f was not written (Bench's diagnostics write failed — see the [bench] stderr line in /tmp/graft_bench.log)" >&2
      exit 1
    fi
  done
  cp target/bench_spread.json "bench_spread_$bsf.json"
  cp target/bench_medians.json "bench_medians_$bsf.json"
  cp target/bench_telemetry.json "bench_telemetry_$bsf.json"
  cp target/bench_builds.json "bench_builds_$bsf.json"
  echo "build attribution (query -> artifacts paid):"
  cat "bench_builds_$bsf.json"
fi
