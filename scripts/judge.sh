#!/usr/bin/env bash
# One-command repro harness for the judge: runs the full verification loop —
#   1. sbt test            (ScalaTest suite)
#   2. graft.Verify + DuckDB oracle compare at sf0.001 / sf0.01 / sf0.1
#   3. the official quiet bench (graft.Bench, bare JVM, full probes)
# — and emits ONE JSON verdict line on stdout (also written to a file:
# the gitignored JUDGE_RUN.json by default, so casual verification runs
# leave `git status` clean — the committed JUDGE_LAST.json is the official
# end-of-round certification and is only touched when named explicitly,
# the same explicit-only discipline as Bench's SPARK_GRAFT_BENCH_OUT).
# Exit 0 iff every gate passed AND the bench window self-certified quiet
# (contended-window benches report "bench_quiet":false but do not fail the
# harness: re-run in a quieter window).
#
# Usage: scripts/judge.sh            (from anywhere; ~6 min total)
#        SKIP_TESTS=1 scripts/judge.sh   (skip step 1 when iterating)
#        JUDGE_OUT=JUDGE_LAST.json scripts/judge.sh   (official certification)
set -u
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:/opt/spark/jars/*"
fail=0

# ---- 1. sbt test ----------------------------------------------------------
tests_passed=0; tests_failed=-1
if [ "${SKIP_TESTS:-0}" != "1" ]; then
  sbt -batch test > /tmp/judge_sbt_test.log 2>&1
  line=$(grep -E "Tests: succeeded" /tmp/judge_sbt_test.log | tail -1)
  tests_passed=$(echo "$line" | sed -n 's/.*succeeded \([0-9]*\).*/\1/p')
  tests_failed=$(echo "$line" | sed -n 's/.*failed \([0-9]*\).*/\1/p')
  tests_passed=${tests_passed:-0}; tests_failed=${tests_failed:--1}
  [ "$tests_failed" = "0" ] || fail=1
else
  sbt -batch compile > /tmp/judge_sbt_test.log 2>&1 || fail=1
  tests_failed=-1 # skipped
fi

# ---- 2. Verify + oracle at all three SFs ---------------------------------
declare -A oracle_result
for sf in 0.001 0.01 0.1; do
  out="/tmp/judge_verify_sf$sf"
  rm -rf "$out"
  SPARK_GRAFT_CPUS=32 java -cp "$CP" -Xmx16g graft.Verify \
    "/root/testdata/sf$sf" "$out" > "/tmp/judge_verify_sf$sf.log" 2>&1
  if [ $? -ne 0 ]; then oracle_result[$sf]="verify-failed"; fail=1; continue; fi
  res=$(python3 scripts/check_oracle.py "/root/testdata/sf$sf" "$out" 2>&1 | tail -1)
  # "== N/M oracle-checked queries pass"
  n=$(echo "$res" | sed -n 's/.*== \([0-9]*\)\/\([0-9]*\).*/\1/p')
  m=$(echo "$res" | sed -n 's/.*== \([0-9]*\)\/\([0-9]*\).*/\2/p')
  oracle_result[$sf]="${n:-0}/${m:-0}"
  # m must be a known POSITIVE total: "== 0/0" parses, 0==0 holds, and the
  # SF would count green with nothing checked (e.g. an output-format drift
  # that still prints the "==" line over zero queries).
  [ -n "$n" ] && [ "${m:-0}" -gt 0 ] && [ "$n" = "$m" ] || fail=1
done

# ---- 3. official quiet bench ---------------------------------------------
# The bench runs LAST, right after the suite + three Verify passes, so its
# first window often reads hot (BASELINE.md documents ~1.15x median on-CPU
# inflation with a 1.6-2x tail every round). When the probes self-report
# contended, wait for the wake to settle and retry ONCE — certifications
# become quiet-by-construction instead of adjudicated-after-the-fact.
# BENCH_RETRY=0 disables; BENCH_RETRY_DELAY seconds between attempts.
run_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=/tmp/judge_bench.json \
    java -cp "$CP" -Xmx16g graft.Bench > /tmp/judge_bench.log 2>&1
}
run_bench
bench_rc=$?

# Probe checks per BASELINE.md: both spins < 2x ref on both sides, mem_bw
# >= 50% of ref on both sides. Also flag (not fail) when the fresh run's
# surface fingerprint differs from the committed BENCH_LAST.json — a total
# comparison against the committed snapshot is then invalid by definition.
# Done in python (jq is not guaranteed).
eval_bench() { python3 - <<'EOF'
import json
try:
    d = json.load(open('/tmp/judge_bench.json'))
except Exception:
    print('null false false []'); raise SystemExit
quiet = True
for k, ref in [('spin', 'spin_ref_sec'), ('spin_mt', 'spin_mt_ref_sec')]:
    r = d.get(ref)
    for side in ('before', 'after'):
        v = d.get(f'{k}_{side}_sec')
        if r is None or v is None or v >= 2 * r:
            quiet = False
r = d.get('mem_bw_ref_gbps')
for side in ('before', 'after'):
    # gate on the MIN of the timed sweeps (conservative: a majority-
    # contended probe window must not self-certify quiet via one clean
    # sweep); mem_bw_gbps_* stays the max = capacity reading
    v = d.get(f'mem_bw_min_gbps_{side}', d.get(f'mem_bw_gbps_{side}'))
    if r is None or v is None or v < 0.5 * r:
        quiet = False
if d.get('errors'):
    quiet = False
try:
    c = json.load(open('BENCH_LAST.json'))
    match = all(d.get(k) == c.get(k)
                for k in ('bench_surface', 'bench_surface_n', 'bench_surface_fp'))
except Exception:
    c, match = {}, False
# Per-query on-CPU regression gate (BASELINE.md: diff queries_cpu before
# wall — on-CPU is the window-stable signal). Only meaningful against the
# committed snapshot on an IDENTICAL surface; flags (never fails) any query
# whose fresh on-CPU is >2x the committed value AND >1.0 s above it.
# Thresholds are calibrated against measured SAME-BINARY spread, not
# wishful tightness: across five certified-quiet runs of one binary
# x5_embed_neardup's on-CPU spanned 9.75-15.32 s (1.57x; wall stable at
# 0.54-0.69 s — parallel speculative CPU, not work), so a 1.5x gate flags
# pure jitter. Note cpu_total itself tracks host memory speed +-20%, so a
# broad uniform drift across MANY queries is a window artifact — a real
# plan regression shows as one or two isolated flags.
regs = []
if match:
    fresh, base = d.get('queries_cpu') or {}, c.get('queries_cpu') or {}
    for q in sorted(fresh):
        f, b = fresh.get(q), base.get(q)
        if f is not None and b is not None and f > 2.0 * b and f - b > 1.0:
            regs.append('%s:%.2f->%.2f' % (q, b, f))
# emitted space-free so the shell `read` keeps it one token
regs_json = '[' + ','.join('"%s"' % r for r in regs) + ']'
print(d.get('value', 'null'), str(quiet).lower(), str(match).lower(), regs_json)
EOF
}
read -r bench_total bench_quiet surface_matches cpu_regressions <<< "$(eval_bench)"

bench_retried=false
if [ "$bench_quiet" != "true" ] && [ "${BENCH_RETRY:-1}" = "1" ]; then
  bench_retried=true
  cp -f /tmp/judge_bench.json /tmp/judge_bench_try1.json 2>/dev/null || true
  try1_rc=$bench_rc; try1_total=$bench_total; try1_quiet=$bench_quiet
  try1_matches=$surface_matches; try1_regs=$cpu_regressions
  sleep "${BENCH_RETRY_DELAY:-90}"
  run_bench
  bench_rc=$?
  read -r bench_total bench_quiet surface_matches cpu_regressions <<< "$(eval_bench)"
  # adopt the retry when it is quiet (the point of retrying) or, with both
  # windows contended, when its total is the less inflated one; otherwise
  # restore attempt 1 as the official artifact
  keep2=$(python3 -c "
import sys
q2, t1, t2 = sys.argv[1] == 'true', sys.argv[2], sys.argv[3]
def f(x):
    try: return float(x)
    except Exception: return float('inf')
print('yes' if q2 or f(t2) <= f(t1) else 'no')" "$bench_quiet" "$try1_total" "$bench_total")
  if [ "$keep2" != "yes" ]; then
    cp -f /tmp/judge_bench_try1.json /tmp/judge_bench.json 2>/dev/null || true
    bench_rc=$try1_rc; bench_total=$try1_total; bench_quiet=$try1_quiet
    surface_matches=$try1_matches; cpu_regressions=$try1_regs
  fi
fi

[ "$bench_rc" -eq 0 ] || fail=1

# ---- verdict --------------------------------------------------------------
verdict=$(printf '{"tests_passed":%s,"tests_failed":%s,"oracle_sf0.001":"%s","oracle_sf0.01":"%s","oracle_sf0.1":"%s","bench_total_sec":%s,"bench_rc":%s,"bench_quiet":%s,"bench_retried":%s,"bench_surface_matches_committed":%s,"cpu_regressions":%s,"gates_green":%s}' \
  "$tests_passed" "$tests_failed" \
  "${oracle_result[0.001]}" "${oracle_result[0.01]}" "${oracle_result[0.1]}" \
  "$bench_total" "$bench_rc" "$bench_quiet" "$bench_retried" "$surface_matches" \
  "${cpu_regressions:-[]}" \
  "$([ $fail -eq 0 ] && echo true || echo false)")
echo "$verdict" | tee "${JUDGE_OUT:-JUDGE_RUN.json}"
exit $fail
