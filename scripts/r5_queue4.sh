# Round-5 TPU queue 4 (after q3):
#  1. gsbench auto-budgets 5M — the gather-consolidation payoff measurement
#     (target <2 s fwd; was 2.21 s).
#  2. gssort_split 5 — post-refactor phase attribution.
#  3. MDM1024 full-remat + fused-FF retry (fwd bm=512@c640 fix landed after
#     q3 step 1 failed).
#  4. MDM512 training re-measure at the default recipe (dots_attn) — the
#     c=640 FF block changes touch its step; guard against regression.
set -x
cd /root/repo
LOG=/tmp/r5_tpu.log
run() {
  step=$1; shift
  t=$1; shift
  echo "=== q4 step $step: $* $(date -u +%H:%M:%S) ===" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "=== q4 step $step exit $? ===" >> $LOG
}
run 1 3000 env GSBENCH_AUTO=1 GSBENCH_BIG=1 python scripts/gsbench.py
run 2 2400 python scripts/gssort_split.py 5
run 3 4000 python scripts/fambwd.py none --latents --preset=mdm1024
run 4 3000 python scripts/fambwd.py none --latents --remat=dots_attn
echo "QUEUE4 DONE $(date -u)" >> $LOG
